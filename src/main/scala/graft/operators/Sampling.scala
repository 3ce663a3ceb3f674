package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.llm.TextOps

/** Deterministic stratified sampling — the class-balancing step of a
  * training-data pipeline ("cap every language/source/label at k
  * documents, chosen uniformly but reproducibly"). No reference
  * counterpart (SURVEY §2.6); north-star extension surface.
  *
  * Sample membership is a pure function of (salt, id): rows are ranked
  * per stratum by `md5(salt | id)` and the k smallest win. Same
  * engine-portable determinism contract as [[TextOps.hashBucket]] — the
  * selection is stable across runs, partitionings, and engines, and
  * re-running after a corpus append only swaps members where new hashes
  * land inside the top k (uniform without replacement per stratum).
  *
  * Scale design: strata are FEW by construction (languages, sources,
  * quality bands), so a single `row_number` window per stratum would
  * shuffle the whole corpus onto |strata| tasks — a built-in straggler.
  * Instead rank twice:
  *   1. per (stratum, salt-bucket) — `rSalt` parallel sorts of
  *      ~|stratum|/rSalt rows each, spill-safe, no hot task;
  *   2. per stratum over the surviving ≤ rSalt·k rows — trivially small.
  * Any row in a stratum's global top k is in its bucket's top k, so the
  * two-phase form selects exactly the single-window result (unit-tested).
  */
object Sampling {

  /** k rows per stratum, smallest `md5(salt|id)` first. Output keeps all
    * input columns plus `sample_key` (the hex rank key) and `rank`
    * (1-based position within the stratum). `idCol` must be unique — it
    * tie-breaks and salts, making ranking total and deterministic.
    */
  def stratifiedTopK(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      k: Int,
      salt: String,
      rSalt: Int = 16): DataFrame = {
    require(k > 0 && rSalt > 0, s"need k ($k) > 0 and rSalt ($rSalt) > 0")
    val key = md5(concat(lit(s"$salt|"), col(idCol).cast("string")))
    val bucket = TextOps.hashBucket(col(idCol), s"$salt#bucket", rSalt)
    val perBucket = Window.partitionBy(col(strataCol), col("_sb"))
      .orderBy(col("sample_key"), col(idCol))
    val perStratum = Window.partitionBy(col(strataCol))
      .orderBy(col("sample_key"), col(idCol))
    df.withColumn("sample_key", key)
      .withColumn("_sb", bucket)
      .withColumn("_rb", row_number().over(perBucket))
      .filter(col("_rb") <= k)
      .withColumn("rank", row_number().over(perStratum))
      .filter(col("rank") <= k)
      .drop("_sb", "_rb")
  }

  /** Weighted bottom-k sample per stratum (the weighted bottom-k sketch
    * of Cohen & Kaplan 2007, integer-weight form): an item with weight w
    * draws w independent 48-bit md5 keys and keeps the MINIMUM; the k
    * smallest keys per stratum are the sample. Min-of-w-uniforms has
    * CDF 1−(1−u)^w, so inclusion probability rises with weight — the
    * heavy documents a token-weighted corpus audit should oversample —
    * while membership stays a pure function of (salt, id, weight):
    * reproducible across runs, partitionings, and engines, and the
    * sketch is MERGEABLE (min is a monoid) like X145's minhash.
    *
    * Exactness: keys are integers (no float, no u^(1/w) pow whose
    * last-ulp rounding could swap adjacent ranks cross-engine — that
    * spelling was rejected); ties break on (key, id). Weights clamp to
    * [1, maxWeight] — the cap bounds per-row hashing at maxWeight md5s
    * computed IN-ROW (transform over sequence, no row inflation).
    *
    * Shape: [[stratifiedTopK]]'s two-phase rank (random sub-bucket
    * prune, then the stratum rank over ≤ rSalt·k survivors) — lossless
    * because a stratum-top-k row is its bucket's top-k a fortiori.
    */
  def weightedBottomK(df: DataFrame, strataCol: String, idCol: String,
      weightCol: String, k: Int, salt: String, maxWeight: Int = 32,
      rSalt: Int = 16): DataFrame = {
    require(k > 0 && maxWeight > 0 && rSalt > 0,
      s"need k ($k), maxWeight ($maxWeight), rSalt ($rSalt) > 0")
    val w = least(greatest(col(weightCol).cast("long"), lit(1L)),
      lit(maxWeight.toLong))
    val key = array_min(transform(sequence(lit(1L), w),
      j => conv(substring(md5(concat(lit(s"$salt|"),
        col(idCol).cast("string"), lit("|"), j.cast("string"))), 1, 12),
        16, 10).cast("long")))
    val bucket = TextOps.hashBucket(col(idCol), s"$salt#bucket", rSalt)
    val perBucket = Window.partitionBy(col(strataCol), col("_sb"))
      .orderBy(col("sample_key"), col(idCol))
    val perStratum = Window.partitionBy(col(strataCol))
      .orderBy(col("sample_key"), col(idCol))
    df.withColumn("sample_key", key)
      .withColumn("_sb", bucket)
      .withColumn("_rb", row_number().over(perBucket))
      .filter(col("_rb") <= k)
      .withColumn("rank", row_number().over(perStratum))
      .filter(col("rank") <= k)
      .drop("_sb", "_rb")
  }

  /** Few-shot prompt assembly: per class, take the [[stratifiedTopK]]
    * sample in hash-rank order and keep the PREFIX whose cumulative
    * token count fits `budgetTokens` — "pick reproducible few-shot
    * examples per label, stop before the prompt overflows". Prefix-stop
    * deliberately, not skip-and-continue (that is waterFill's bin
    * packing): few-shot examples are an ordered list, and skipping a
    * long example mid-list would silently reorder the prompt. With
    * positive token counts the cumulative sum is strictly increasing,
    * so `cum <= budget` IS the prefix — no second pass needed.
    *
    * Scale: ranking is stratifiedTopK's two-phase form (no per-class
    * straggler task); the cumulative window and the final aggregate run
    * over ≤ k rows per class. Output: (strataCol, n_examples,
    * total_tokens, example_ids) with example_ids a rank-ordered CSV.
    */
  def promptPack(df: DataFrame, strataCol: String, idCol: String,
      tokensCol: String, budgetTokens: Long, maxExamples: Int,
      salt: String): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens ($budgetTokens) must be > 0")
    val cumW = Window.partitionBy(col(strataCol)).orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, 0)
    stratifiedTopK(df, strataCol, idCol, maxExamples, salt)
      .withColumn("_cum", sum(col(tokensCol)).over(cumW))
      .filter(col("_cum") <= budgetTokens)
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_examples"),
        sum(col(tokensCol)).as("total_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("rank"),
            col(idCol).cast("string").as("_id")))),
          x => x.getField("_id")), ",").as("example_ids"))
  }
}

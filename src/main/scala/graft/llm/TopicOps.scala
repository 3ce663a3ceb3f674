package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Topic modeling over the documents table (X293; pLSA — Hofmann
  * SIGIR'99, the EM ancestor of LDA) — the corpus-structure family the
  * surface lacked: "what mixtures of word distributions generated this
  * corpus", the unsupervised complement to the supervised classifier
  * (X198) and the MI screening (X283).
  */
object TopicOps {

  private def dec(x: Column): Column = x.cast("decimal(38,0)")

  /** pLSA by `rounds` unrolled EM iterations, all-integer (X56/X192
    * replayable-loop discipline):
    *
    *  - model: P(w,d) = Σ_z p(z|d)·p(w|z); parameters p(z|d) in MICRO
    *    (10⁶) and p(w|z) in NANO (10⁹ — per-topic word masses are
    *    corpus-scale, and a micro floor would zero rare words'
    *    probabilities; nano keeps every smoothed probability nonzero
    *    up to ~10⁹ weighted tokens per topic — the documented
    *    envelope, raise the scale beyond it);
    *  - E-step: r(z|d,w) = ⌊pzd·pwz·10⁶ / Σ_z pzd·pwz⌋ (numerators
    *    ≤ 10¹⁵ per z; the ·10⁶ product routes through decimal(38,0));
    *  - M-step with add-one smoothing (keeps every probability
    *    nonzero so no E-step denominator can hit 0):
    *    p(w|z) = ⌊(S_zw+1)·10⁹ / (Σ_w S_zw + |V|)⌋,
    *    p(z|d) = ⌊(S_dz+1)·10⁶ / (Σ_z S_dz + K)⌋,
    *    S = Σ n(d,w)·r — exact integer sums;
    *  - init: deterministic keyed-md5 raw weights 1 + h%5, normalized
    *    the same way — identical in both engines, no RNG.
    *
    * All divisions have nonnegative operands — [[TextOps.floorDivDec]]
    * ≡ DuckDB `//`.
    *
    * Scale: the E-step table is nnz(d,w)·K rows built by two hash
    * equi-joins (on d against the |docs|×K mixture table, on (w,z)
    * against the vocab×K topic table); every M-step aggregation gets
    * map-side partial combine and shuffles vocab×K or docs×K rows.
    * Each round is checkpointed (the output feeds two joins next
    * round — unmaterialized, the plan doubles per round, the X192
    * lesson). Driver never sees data; the vocabulary size rides a
    * broadcast 1-row count.
    *
    * Output: (topic, rank, word, p_nano, weight) — top `topWords`
    * per topic by (p desc, word), where weight = S_zw.
    */
  def plsaTopics(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 4, rounds: Int = 3, topWords: Int = 8,
      materialize: DataFrame => DataFrame = _.localCheckpoint(eager = true))
      : DataFrame = {
    require(k >= 2, s"k ($k) must be >= 2")
    require(rounds >= 1, s"rounds ($rounds) must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val n = materialize(docs
      .select(col(idCol).as("d"), explode(TextOps.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("d", "w").agg(count(lit(1)).as("n")))
    val zs = broadcast((0 until k).toDF("z"))
    def hmod(prefix: String, a: Column, b: Column): Column =
      expr(s"cast(conv(substring(md5(concat('$prefix', " +
        s"cast(${a.toString} as string), '|', cast(${b.toString} as string)" +
        s")), 1, 15), 16, 10) as bigint)") % 5 + 1
    // init p(z|d): raw 1+h%5 per (d,z), micro-normalized per doc
    var pzd = materialize {
      val raw = n.select("d").distinct().crossJoin(zs)
        .withColumn("_r", hmod("plsa_d|", col("d"), col("z")))
      raw.withColumn("_t", sum("_r").over(Window.partitionBy("d")))
        .select(col("d"), col("z"),
          TextOps.floorDivDec(dec(col("_r")) * lit(1000000L),
            dec(col("_t"))).cast("long").as("p"))
    }
    // init p(w|z): raw per (w,z), nano-normalized per topic over vocab
    var pwz = materialize {
      val raw = n.select("w").distinct().crossJoin(zs)
        .withColumn("_r", hmod("plsa_w|", col("w"), col("z")))
      raw.withColumn("_t", sum("_r").over(Window.partitionBy("z")))
        .select(col("w"), col("z"),
          TextOps.floorDivDec(dec(col("_r")) * lit(1000000000L),
            dec(col("_t"))).cast("long").as("p"))
    }
    val vocab = n.select("w").distinct().agg(count(lit(1)).as("_v"))
    var sw: DataFrame = null
    (1 to rounds).foreach { _ =>
      // pinned: the E-step frame (two joins + a (d,w) window) feeds
      // BOTH M-step aggregations — unmaterialized it runs twice/round
      val e = materialize(n
        .join(pzd.select(col("d"), col("z"), col("p").as("_pzd")), "d")
        .join(pwz.select(col("w"), col("z"), col("p").as("_pwz")),
          Seq("w", "z"))
        .withColumn("_num", dec(col("_pzd")) * dec(col("_pwz")))
        .withColumn("_den", sum("_num").over(Window.partitionBy("d", "w")))
        .withColumn("_r", TextOps.floorDivDec(
          col("_num") * lit(1000000L), col("_den")).cast("long"))
        .select(col("d"), col("w"), col("z"),
          (col("n") * col("_r")).as("_s")))
      sw = materialize(e.groupBy("z", "w").agg(sum("_s").as("s")))
      pwz = materialize(sw
        .withColumn("_t", sum("s").over(Window.partitionBy("z")))
        .crossJoin(broadcast(vocab))
        .select(col("w"), col("z"),
          TextOps.floorDivDec((dec(col("s")) + 1) * lit(1000000000L),
            dec(col("_t")) + dec(col("_v"))).cast("long").as("p")))
      pzd = materialize(e.groupBy("d", "z").agg(sum("_s").as("s"))
        .withColumn("_t", sum("s").over(Window.partitionBy("d")))
        .select(col("d"), col("z"),
          TextOps.floorDivDec((dec(col("s")) + 1) * lit(1000000L),
            dec(col("_t")) + lit(k.toLong)).cast("long").as("p")))
    }
    pwz.join(sw, Seq("z", "w"))
      .withColumn("rank", row_number().over(Window.partitionBy("z")
        .orderBy(col("p").desc, col("w"))))
      .filter(col("rank") <= topWords)
      .select(col("z").as("topic"), col("rank").cast("int").as("rank"),
        col("w").as("word"), col("p").as("p_nano"),
        TextOps.floorDivDec(dec(col("s")), lit(1000000L).cast("decimal(38,0)"))
          .cast("long").as("weight"))
      .orderBy("topic", "rank")
  }

  /** Incremental topic assignment by FOLD-IN (X300; Hofmann SIGIR'99
    * §3.3 — the standard pLSA answer to "a new batch arrived"): the
    * topic-word table p(w|z) trained on the BASE corpus is FROZEN and
    * only the new documents' mixtures p(z|d) are inferred, by
    * `foldRounds` E-steps restricted to the batch — the
    * index-maintenance discipline (probe-vs-index, llm_suffix_
    * incremental / llm_pca_incremental) applied to topic models:
    * per-batch cost is batch-nnz×K, the base corpus is never
    * re-touched, and assignments are reproducible because the model
    * is pinned. (Full retraining drifts every historical assignment
    * each batch — the operational reason fold-in exists.)
    *
    * Training and fold-in use the SAME arithmetic as [[plsaTopics]]
    * (micro mixtures, nano topic probabilities, add-one smoothing,
    * keyed-md5 init — batch docs initialize with the same
    * `plsa_d|` hash rule, so a doc's init is independent of which
    * side it arrives on). A batch word absent from the base
    * vocabulary has no p(w|z) row and drops from the E-step (the
    * out-of-vocabulary contract every frozen-model scorer shares).
    *
    * Output: (idCol, topic, p_micro) for every batch doc × topic,
    * ordered — the batch docs' inferred mixtures.
    */
  def plsaFoldIn(baseDocs: DataFrame, batchDocs: DataFrame, idCol: String,
      textCol: String, k: Int = 4, trainRounds: Int = 3,
      foldRounds: Int = 2,
      materialize: DataFrame => DataFrame = _.localCheckpoint(eager = true))
      : DataFrame = {
    require(foldRounds >= 1, s"foldRounds ($foldRounds) must be >= 1")
    val spark = baseDocs.sparkSession
    import spark.implicits._
    // train on the base; keep only the frozen topic-word table
    val trained = plsaTopics(baseDocs, idCol, textCol, k, trainRounds,
      topWords = Int.MaxValue, materialize = materialize)
    val pwz = materialize(trained.select(col("word").as("w"),
      col("topic").as("z"), col("p_nano").as("_pwz")))
    val nB = materialize(batchDocs
      .select(col(idCol).as("d"), explode(TextOps.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("d", "w").agg(count(lit(1)).as("n")))
    val zs = broadcast((0 until k).toDF("z"))
    def hmod(a: Column, b: Column): Column =
      expr("cast(conv(substring(md5(concat('plsa_d|', " +
        s"cast(${a.toString} as string), '|', cast(${b.toString} as string)" +
        ")), 1, 15), 16, 10) as bigint)") % 5 + 1
    var pzd = materialize {
      val raw = nB.select("d").distinct().crossJoin(zs)
        .withColumn("_r", hmod(col("d"), col("z")))
      raw.withColumn("_t", sum("_r").over(Window.partitionBy("d")))
        .select(col("d"), col("z"),
          TextOps.floorDivDec(dec(col("_r")) * lit(1000000L),
            dec(col("_t"))).cast("long").as("p"))
    }
    (1 to foldRounds).foreach { _ =>
      val e = nB
        .join(pzd.select(col("d"), col("z"), col("p").as("_pzd")), "d")
        .join(pwz, Seq("w", "z")) // OOV batch words drop here
        .withColumn("_num", dec(col("_pzd")) * dec(col("_pwz")))
        .withColumn("_den", sum("_num").over(Window.partitionBy("d", "w")))
        .withColumn("_r", TextOps.floorDivDec(
          col("_num") * lit(1000000L), col("_den")).cast("long"))
        .select(col("d"), col("z"), (col("n") * col("_r")).as("_s"))
      val upd = e.groupBy("d", "z").agg(sum("_s").as("s"))
        .withColumn("_t", sum("s").over(Window.partitionBy("d")))
        .select(col("d"), col("z"),
          TextOps.floorDivDec((dec(col("s")) + 1) * lit(1000000L),
            dec(col("_t")) + lit(k.toLong)).cast("long").as("p"))
      // an all-OOV doc has no E-step rows: it KEEPS its current
      // mixture instead of vanishing (left join + coalesce)
      pzd = materialize(pzd
        .select(col("d"), col("z"), col("p").as("_p0"))
        .join(upd.select(col("d"), col("z"), col("p").as("_p1")),
          Seq("d", "z"), "left")
        .select(col("d"), col("z"),
          coalesce(col("_p1"), col("_p0")).as("p")))
    }
    pzd.select(col("d").as(idCol), col("z").as("topic"),
        col("p").as("p_micro"))
      .orderBy(idCol, "topic")
  }
}

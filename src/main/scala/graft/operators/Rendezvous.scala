package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) hashing — Thaler & Ravishankar
  * 1996, the shard-assignment scheme behind consistent object placement:
  * row → argmax over shards s of h(s, salt, id). Its defining property
  * is MINIMAL MOVEMENT: growing n → n+1 re-homes only the rows whose
  * new argmax IS the new shard (expected 1/(n+1) of the corpus), while
  * a plain `hash(id) % n` reshuffles ~n/(n+1) of everything — the
  * difference between "tonight's incremental shard rebuild touches one
  * new shard" and "every training-data shard is rewritten".
  *
  * Determinism & portability: the weight is the md5 HEX STRING of
  * `"s|salt|id"`, compared lexicographically — same 32-char lowercase
  * hex in Spark and DuckDB (the X37 sampling contract), no integer
  * conversion, ties impossible in practice. The argmax runs INSIDE an
  * array expression (`array_max` over `transform(sequence(0, n−1))`
  * structs ordered by (h, s)) — a narrow per-row map with ZERO shuffle
  * and no row inflation, linear in n per row (n = shard count, a small
  * constant; an exploded spelling would n× the corpus before a combine
  * agg for nothing).
  */
object Rendezvous {

  /** Adds `shard` (int in [0, n)) — the HRW assignment of each row's
    * `idCol` under `salt`. Pure function of (id, n, salt): independent
    * of partitioning, row order, and engine.
    */
  def assign(df: DataFrame, idCol: String, n: Int, salt: String): DataFrame = {
    require(n > 0, s"n ($n) must be positive")
    df.withColumn("shard",
      array_max(transform(sequence(lit(0), lit(n - 1)),
        s => struct(
          md5(concat(s.cast("string"), lit("|" + salt + "|"),
            col(idCol).cast("string"))).as("h"),
          s.as("s"))))
        .getField("s"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full k-core DECOMPOSITION — the coreness number of every vertex —
  * via the h-index fixpoint (Lü–Chen–Zhang–Zhou–Stanley, PNAS 2016):
  * start from c_v = deg(v) and iterate c_v ← H({c_u : u ∈ N(v)}),
  * where H is the h-index of the neighbor multiset (max h such that
  * ≥ h neighbors hold value ≥ h). The sequence is monotone
  * non-increasing per vertex and converges exactly to coreness —
  * which upgrades KCore (one fixed k per run) to the whole
  * decomposition in ONE loop, the form a curation stack actually
  * stores ("how deep does this item sit in the co-occurrence
  * structure").
  *
  * Why h-index and not sequential peel: the textbook min-degree peel
  * is inherently sequential (|V| rounds); h-index iteration is
  * level-synchronous — every vertex updates from its neighbors'
  * carried values, one equi-join + one adjacency-sized window per
  * round, and real graphs converge in a few dozen rounds. Monotone
  * convergence licenses the unrolled oracle (surplus rounds no-op).
  *
  * All-integer: H comes from ranks — h = max over the desc-sorted
  * neighbor values of min(rank, value); tie order within equal
  * values cannot change the result (the multiset decides). One count
  * action per round decides the fixpoint; carried frames pass
  * through Iterate.cut (the data-dependent-loop rule).
  *
  * Input: undirected edges, deduped, a < b. Output: (node, coreness).
  */
object Coreness {

  def decompose(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxRounds: Int = 60): DataFrame = {
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val und = Iterate.cut(
      e.select(col("a").as("v"), col("b").as("u"))
        .unionAll(e.select(col("b").as("v"), col("a").as("u"))))
    var cur = Iterate.cut(
      und.groupBy(col("v").as("n")).agg(count(lit(1)).as("c")))
    var rounds = 0
    var done = false
    while (!done) {
      rounds += 1
      if (rounds > maxRounds) throw new IllegalStateException(
        s"Coreness: no fixpoint after $maxRounds rounds — raise maxRounds")
      val w = Window.partitionBy("v").orderBy(col("cu").desc)
      val next = Iterate.cut(und
        .join(cur.withColumnRenamed("n", "u").withColumnRenamed("c", "cu"),
          Seq("u"))
        .withColumn("r", row_number().over(w).cast("long"))
        .select(col("v"), least(col("r"), col("cu")).as("hv"))
        .groupBy(col("v").as("n")).agg(max("hv").as("c")))
      val changed = cur.join(next.withColumnRenamed("c", "c2"), Seq("n"))
        .filter(col("c") =!= col("c2")).count()
      done = changed == 0
      cur = next
    }
    cur.select(col("n").as("node"), col("c").as("coreness"))
  }
}

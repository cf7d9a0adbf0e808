package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator: builds sfN data from sf0.1 by unioning K
  * key-shifted copies (K=10 → sf1). Used ONLY for the local
  * scale-validation bench (VERDICT r3 #6) — the driver's own testdata
  * is read-only and its generator is not available here, so instead of
  * guessing its distributions we replicate them exactly.
  *
  * Design constraints the copies must respect, so that per-query cost
  * scales the way a REAL 10x corpus would:
  *
  *  - Every id column shifts by `copy * KeyStride`: joins match only
  *    within a copy, so join selectivities and per-key group sizes stay
  *    constant while key cardinality grows 10x (a real bigger corpus
  *    has more users/orders, not denser ones). Copy 0 is the identity,
  *    so any literal ids referenced by catalog queries still exist.
  *  - `documents.text` is passed through a per-copy alphabet rotation
  *    (translate). Equal texts stay equal WITHIN a copy, but exact and
  *    near-dup (shingle-level) groups never merge ACROSS copies —
  *    otherwise every dup group would grow 10x and pair-quadratic
  *    operators would be forced super-linear by construction, which is
  *    not what a bigger real corpus does. Lengths and word shapes are
  *    preserved (n_chars stays truthful).
  *  - `embeddings.embedding` gets a per-copy deterministic sign-flip
  *    pattern: flipping the SAME coordinates of every vector in a copy
  *    preserves all within-copy dot products and norms exactly (the
  *    copy's kNN/near-dup geometry is bit-identical) while making
  *    cross-copy cosines behave like unrelated vectors, so ANN
  *    candidate buckets grow in count, not in density.
  *  - Dims (`region`, `nation`) stay fixed-size, as in TPC-H.
  *
  * Output layout is a directory per table (Spark-native parquet), which
  * `Tables.table` reads identically to the driver's single files.
  */
object GenData {
  private val KeyStride = 1000000000L

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("testdata/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, copies)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String, copies: Int): Unit = {
    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$out/$name.parquet")

    // Fixed dims: byte-identical pass-through.
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    /** One scan fanned out to `copies` rows per input row via a
      * broadcast 10-row cross join; `shifted` columns get +copy*stride. */
    def scaled(name: String, shifted: Seq[String], extra: DataFrame => DataFrame = identity): DataFrame = {
      val base = read(name)
      val idx = broadcast(spark.range(copies).toDF("gen_copy"))
      val fanned = base.crossJoin(idx)
      val withKeys = shifted.foldLeft(fanned) { (df, c) =>
        df.withColumn(c, col(c) + col("gen_copy") * KeyStride)
      }
      extra(withKeys).select(base.columns.map(col).toIndexedSeq: _*)
    }

    write(scaled("customer", Seq("c_custkey")), "customer", 4)
    write(scaled("supplier", Seq("s_suppkey")), "supplier", 1)
    write(scaled("part", Seq("p_partkey")), "part", 2)
    write(scaled("orders", Seq("o_orderkey", "o_custkey")), "orders", 8)
    write(scaled("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem", 32)
    write(scaled("events", Seq("event_id", "user_id")), "events", 16)

    // Per-copy alphabet rotation: copy i maps letter c -> (c+i) mod 26.
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rot(i: Int): String = alpha.drop(i % 26) + alpha.take(i % 26)
    val rotText = (0 until copies).foldLeft(lit(null).cast("string")) { (acc, i) =>
      when(col("gen_copy") === i, translate(col("text"), alpha, rot(i))).otherwise(acc)
    }
    write(
      scaled("documents", Seq("doc_id"), _.withColumn("text", rotText)),
      "documents", 8)

    // Per-copy sign pattern over the 64 coords: deterministic LCG-ish
    // hash of (copy, coord); copy 0 is all +1 (identity).
    def signs(i: Int): Array[Float] =
      Array.tabulate(64) { j =>
        if (i == 0) 1.0f
        else {
          val h = (i * 2654435761L + j * 40503L) * 0x9e3779b97f4a7c15L
          if (((h >>> 17) & 1L) == 0L) 1.0f else -1.0f
        }
      }
    val flipVec = (0 until copies).foldLeft(lit(null).cast("array<float>")) { (acc, i) =>
      when(
        col("gen_copy") === i,
        zip_with(col("embedding"), lit(signs(i)), (x, s) => (x * s).cast("float"))
      ).otherwise(acc)
    }
    write(
      scaled("embeddings", Seq("vec_id"), _.withColumn("embedding", flipVec)),
      "embeddings", 8)
  }
}

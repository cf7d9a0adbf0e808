package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a 100 TB training-data pipeline.
  *
  * All variants follow the same scale shape: per-row signature work is
  * narrow (codegen over the scan), candidate generation happens via an
  * equi-join on a small key (band signature / shingle / bucket) so
  * Spark shuffles only (key, doc_id) pairs — never document text — and
  * verification runs per candidate pair. No driver-side loops, no UDFs.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: groupBy the full text (or its fingerprint at scale —
    * shuffling a 64-bit hash beats shuffling document bodies), keep the
    * smallest id as canonical. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup at scale: hash first, shuffle the hash. 64-bit
    * birthday bound n²/2^65: ~3e-4 expected collisions at 10^8 docs,
    * but ~270 at 10^11 — at that scale use exact() or a 128-bit
    * fingerprint (e.g. md5 halves) so distinct docs aren't silently
    * merged. */
  def exactByFingerprint(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame =
    docs.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // ------------------------------------------------------------- shingles

  /** w-token shingles (n-grams) of the text, distinct. */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (w - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(w)))))
  }

  // ----------------------------------------------------------- minhash/LSH

  /** MinHash signature (per-row expression form): signature[j] = min
    * over shingles of hash_j(shingle). Fine for one-off use; the
    * pipeline path below uses the aggregation form instead — this
    * expression rebuilds the shingle array once per hash function. */
  def minhashSignature(text: Column, k: Int = 64, shingleW: Int = 3): Column = {
    val sh = shingles(text, shingleW)
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(sh, g => xxhash64(g, j))))
  }

  /** MinHash signatures as an aggregation: explode shingles once, then
    * k `min(xxhash64(shingle, j))` aggregates in one groupBy. Map-side
    * partial mins mean the shuffle carries (id, k×8 bytes) per map
    * task — at 100 TB this is the only form that scales; the per-row
    * expression form recomputes the shingle array k times. */
  def minhashSignatures(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", k: Int = 64,
                        shingleW: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol), explode(shingles(col(textCol), shingleW)).as("g"))
    val aggs = (0 until k).map(j => min(xxhash64(col("g"), lit(j))).as(s"h$j"))
    sh.groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until k).map(j => col(s"h$j")): _*).as("sig"))
  }

  /** LSH banding: split the k-wide signature into bands of `rowsPerBand`
    * and hash each band to one bucket key. Docs sharing any band bucket
    * become candidate pairs. Returns (idCol, band, bucket) — exploded,
    * one row per band. */
  def lshBuckets(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                 k: Int = 64, rowsPerBand: Int = 8, shingleW: Int = 3): DataFrame = {
    val nBands = k / rowsPerBand
    minhashSignatures(docs, idCol, textCol, k, shingleW)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(nBands - 1)),
          b => xxhash64(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))).as(Seq("band", "bucket")))
  }

  /** MinHash+LSH near-dup candidate pairs with exact Jaccard verify.
    * Self-join only on (band, bucket) — the shuffled payload is 24
    * bytes/row; text is re-joined per *candidate* for verification. */
  def minhashNearDups(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", threshold: Double = 0.7,
                      k: Int = 64, rowsPerBand: Int = 8, shingleW: Int = 3): DataFrame = {
    // Both sides of the candidate self-join consume the signatures. At
    // pipeline scale, materialize signatures first (write/persist) so
    // the corpus is shingled once; measured at bench scale the two
    // sides race ahead of any cache, so no persist() here — callers
    // owning the lifecycle can persist the lshBuckets result themselves.
    val buckets = lshBuckets(docs, idCol, textCol, k, rowsPerBand, shingleW)
    val candidates = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id1"), col(s"y.$idCol").as("id2"))
      .dropDuplicates()
    val sh = docs.select(col(idCol), shingles(col(textCol), shingleW).as("sh"))
    candidates
      .join(sh.as("s1"), col("id1") === col(s"s1.$idCol"))
      .join(sh.as("s2"), col("id2") === col(s"s2.$idCol"))
      .withColumn("jaccard",
        size(array_intersect(col("s1.sh"), col("s2.sh"))).cast("double") /
          size(array_union(col("s1.sh"), col("s2.sh"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash as pure column expressions: per-token hash → ±1 per
    * bit position → per-position sums via a zip_with fold → sign bits
    * recombined. Near-dups then differ in few bits (hamming distance).
    */
  def simhash(text: Column): Column = {
    val masks = array((0 until 64).map(b => lit(1L << b)): _*)
    val hashes = transform(TextAnalysis.tokens(text), t => xxhash64(t))
    val zeros = array((0 until 64).map(_ => lit(0L)): _*)
    val bitSums = aggregate(
      hashes,
      zeros,
      (acc, h) => zip_with(acc, masks,
        (a, m) => a + when(h.bitwiseAND(m) =!= 0L, lit(1L)).otherwise(lit(-1L))))
    // recombine sign bits: bit b of the signature set iff sum_b > 0
    aggregate(
      zip_with(bitSums, masks, (s, m) => when(s > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ------------------------------------------------------- ngram jaccard

  /** Exact n-gram Jaccard near-dup pairs: candidates = docs sharing at
    * least one shingle (equi-join on the shingle string), verified with
    * exact set arithmetic. Oracle-friendly (no hashing involved). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", threshold: Double = 0.05,
                        shingleW: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol), explode(shingles(col(textCol), shingleW)).as("g"))
    val sizes = docs.select(col(idCol), size(shingles(col(textCol), shingleW)).as("n"))
    val a = sh.withColumnRenamed(idCol, "id1")
    val b = sh.withColumnRenamed(idCol, "id2").withColumnRenamed("g", "gb")
    a.join(b, col("g") === col("gb") && col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("n_common"))
      .join(sizes.withColumnRenamed(idCol, "id1").withColumnRenamed("n", "n1"), "id1")
      .join(sizes.withColumnRenamed(idCol, "id2").withColumnRenamed("n", "n2"), "id2")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n1") + col("n2") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("n_common"), col("jaccard"))
  }
}

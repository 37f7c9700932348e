package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (content
  * hash), MinHash+LSH banding, SimHash, and n-gram Jaccard verification.
  *
  * Scale design: every path is a hash-`groupBy` (shuffle on a hash key)
  * or a band-bucket self-join — never an all-pairs product and never a
  * driver-side collect. At 100 TB the candidate generation cost is
  * O(n · signature) + one shuffle per band, and verification touches only
  * bucket-colliding pairs. Signatures are built with Catalyst higher-order
  * functions over `xxhash64`, so signature computation stays inside
  * Tungsten (no UDF ser/de).
  */
object Dedup {

  /** Normalization applied before hashing/shingling: lower-case, trim,
    * collapse whitespace runs. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Exact-dup groups: one row per distinct normalized content with the
    * member count and the survivor (minimum) id. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(normalize(col(textCol))).as("content_hash"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("keep_id"))

  /** Keep exactly one row (minimum id) per distinct normalized content.
    * Window over the content hash: one shuffle, no join back. */
  def dropExactDups(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(normalize(col(textCol)))).orderBy(col(idCol).asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Word n-gram shingles of the normalized text (distinct). */
  def shingles(text: Column, n: Int): Column = {
    val ts = split(normalize(text), " ")
    array_distinct(
      when(size(ts) <= n, array(array_join(ts, " ")))
        .otherwise(transform(sequence(lit(0), size(ts) - n),
          i => array_join(slice(ts, i + 1, lit(n)), " "))))
  }

  /** MinHash signature: element s = min over shingles of
    * `xxhash64(shingle ++ saltₛ)`. Pure column expressions; one pass. */
  def minhashSignature(text: Column, numHashes: Int, n: Int = 3): Column = {
    val sh = shingles(text, n)
    array((0 until numHashes).map { s =>
      array_min(transform(sh, x => xxhash64(concat(x, lit(s.toString)))))
    }: _*)
  }

  /** LSH band keys: hash of each `rowsPerBand`-slice of the signature.
    * Docs sharing ≥1 band key are candidate near-dups. */
  def bandKeys(signature: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",",
          slice(signature, b * rowsPerBand + 1, rowsPerBand).cast("array<string>")))
          .as("key"))
    }: _*)

  /** Exact Jaccard similarity of the two docs' shingle sets. */
  def jaccardSim(a: Column, b: Column, n: Int = 3): Column = {
    val sa = shingles(a, n)
    val sb = shingles(b, n)
    val inter = size(array_intersect(sa, sb)).cast("double")
    inter / (size(sa) + size(sb) - inter).cast("double")
  }

  /** MinHash-LSH near-duplicate pairs, verified with exact Jaccard.
    *
    * Pipeline: signature → explode band keys → self-join on (band, key)
    * with `idA < idB` → distinct candidate pair → verify Jaccard ≥
    * threshold. The self-join is on the bucket key, so work is
    * O(Σ bucket²) not O(n²); at 100 TB skewed mega-buckets (boilerplate
    * docs) are the risk — cap handled upstream by normalization, and AQE
    * skew-join splits oversized buckets at runtime.
    */
  def minhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                          threshold: Double, numHashes: Int = 96,
                          numBands: Int = 24, n: Int = 3): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val sig = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", minhashSignature(col("text"), numHashes, n))
      .withColumn("bk", explode(bandKeys(col("sig"), numBands, rowsPerBand)))
      .select(col("id"), col("text"), col("bk.band"), col("bk.key"))
    val a = sig.select(col("band"), col("key"), col("id").as("id_a"), col("text").as("text_a"))
    val b = sig.select(col("band"), col("key"), col("id").as("id_b"), col("text").as("text_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "text_a", "text_b").distinct()
      .withColumn("jaccard", jaccardSim(col("text_a"), col("text_b"), n))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash over the token bag: bit i of the fingerprint is the
    * sign of Σ_tokens (bit i of xxhash64(token) ? +1 : −1). The Scala
    * `shiftright` wrapper only takes an Int amount, so the column-amount
    * shifts go through `call_function` to the SQL builtin. */
  def simhash(text: Column): Column = {
    val ts = split(normalize(text), " ")
    def shr(x: Column, i: Column): Column = call_function("shiftright", x, i)
    def shl(x: Column, i: Column): Column = call_function("shiftleft", x, i)
    val bitVotes = aggregate(ts,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, i) => a + when(shr(h, i).bitwiseAND(1) === 1, 1).otherwise(-1))
      })
    aggregate(
      zip_with(bitVotes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, shl(lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (a, x) => a.bitwiseOR(x))
  }

  /** SimHash near-dup candidate pairs: band the 64-bit fingerprint into
    * four 16-bit chunks (Hamming ≤ 3 ⇒ at least one chunk identical),
    * bucket-join, verify true Hamming distance ≤ maxHamming. */
  def simhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                          maxHamming: Int = 3): DataFrame = {
    val withSig = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sim", simhash(col("text")))
    val banded = withSig.withColumn("band", explode(sequence(lit(0), lit(3))))
      .withColumn("chunk",
        call_function("shiftright", col("sim"), col("band") * 16).bitwiseAND(0xFFFFL))
    val a = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sim_a", "sim_b").distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}

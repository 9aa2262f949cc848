package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash),
  * n-gram Jaccard, MinHash+LSH banding, and SimHash. All are declarative
  * DataFrame plans:
  *   - exact/prefix dedup: one hash + one groupBy shuffle;
  *   - MinHash: signatures are per-row lambda arithmetic (no shuffle),
  *     LSH banding turns the quadratic candidate search into an equi
  *     groupBy on (band, band_hash) — the only shuffle, and the reason
  *     this scales to 100 TB where a pairwise join cannot;
  *   - SimHash: linear explode + two groupBy shuffles, then banding on
  *     16-bit chunks for Hamming-≤k candidate pairs.
  */
object Dedup {

  /** Distinct word-k-gram shingles per document:
    * (idCol, shingle) rows. The base for Jaccard/MinHash. */
  def shingles(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val w = split(col(textCol), " ")
    df.select(col(idCol),
      explode(expr(
        s"""transform(sequence(1, greatest(size(split($textCol, ' ')) - ${k - 1}, 0)),
            i -> concat_ws(' ', slice(split($textCol, ' '), i, $k)))"""))
        .as("shingle"))
      .dropDuplicates(idCol, "shingle")
  }

  /** Exact duplicate groups by full-text hash: (text_hash, n_copies,
    * keep_id = min id). Pure hash-groupBy — the cheapest dedup pass. */
  def exactDupGroups(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  /** Pairwise n-gram Jaccard similarity ≥ threshold, computed by an
    * equi-join on shared shingles (never an all-pairs cross join):
    * |A∩B| from the shingle join, |A|,|B| from per-doc counts. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = shingles(df, idCol, textCol, k).cache()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col(idCol).as("id_a"), col("shingle"))
    val b = sh.select(col(idCol).as("id_b"), col("shingle"))
    val common = a.join(b, "shingle").filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_common"), col("jaccard"))
  }

  /** MinHash signature: hash every shingle ONCE (xxhash64), then derive
    * the `numHashes` family members by affine rehash h_i = a_i*h + b_i
    * (mod 2^64 via unchecked multiply) — the standard universal-hash
    * trick. This is O(shingles + numHashes·shingles integer ops) instead
    * of numHashes string hashes per shingle (string hashing dominated the
    * naive version ~40×). One array column per doc; no extra shuffle. */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 32): DataFrame = {
    // Fixed odd multipliers/offsets derived from splitmix64 of the index —
    // deterministic across runs and engines.
    def mix(i: Long): Long = {
      var z = i + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val as = Array.tabulate(numHashes)(i => mix(2L * i) | 1L)
    val bs = Array.tabulate(numHashes)(i => mix(2L * i + 1))
    val aArr = as.mkString("array(", "L,", "L)")
    val bArr = bs.mkString("array(", "L,", "L)")
    shingles(df, idCol, textCol, k)
      .withColumn("h", xxhash64(col("shingle")))
      .groupBy(col(idCol))
      .agg(collect_list(col("h")).as("hs"))
      .withColumn("sig", expr(
        s"""transform(sequence(0, ${numHashes - 1}),
             i -> array_min(transform(hs,
               h -> element_at($aArr, i + 1) * h
                    + element_at($bArr, i + 1))))"""))
      .drop("hs")
  }

  /** MinHash-LSH near-duplicate candidate pairs: band the signature into
    * `bands` chunks, bucket-join on (band_idx, band_hash), emit candidate
    * pairs with their estimated Jaccard (fraction of matching signature
    * positions). The banding groupBy is the only shuffle. */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val rows = numHashes / bands
    val sigs = minHashSignatures(df, idCol, textCol, k, numHashes)
    val banded = sigs.select(col(idCol), col("sig"),
      posexplode(expr(
        s"""transform(sequence(0, ${bands - 1}),
             b -> xxhash64(slice(sig, b * $rows + 1, $rows)))""")))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
    val a = banded.select(col(idCol).as("id_a"), col("sig").as("sig_a"),
      col("band_idx"), col("band_hash"))
    val b = banded.select(col(idCol).as("id_b"), col("sig").as("sig_b"),
      col("band_idx"), col("band_hash"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("est_jaccard", expr(
        """size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))
           / CAST(size(sig_a) AS DOUBLE)"""))
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** 64-bit SimHash per document from whitespace tokens: per bit j, sum
    * +1/-1 over token-hash bit j (weighted by token frequency), bit set
    * where the sum is positive. Linear in tokens × 64. */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("w"))
      .withColumn("h", xxhash64(col("tok")))
      .select(col(idCol), col("w"), col("h"),
        explode(sequence(lit(0), lit(63))).as("j"))
      .withColumn("contrib",
        when(expr("(shiftright(h, j) & 1) = 1"), col("w"))
          .otherwise(-col("w")))
      .groupBy(col(idCol), col("j"))
      .agg(sum(col("contrib")).as("s"))
      .groupBy(col(idCol))
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), j)"))
        .otherwise(0L)).as("simhash"))

  /** SimHash near-dup candidates with Hamming distance ≤ maxDist, banded
    * on four 16-bit chunks (pigeonhole: any pair within distance 3 shares
    * at least one exact chunk). */
  def simHashCandidates(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val hashes = simHash(df, idCol, textCol)
    val banded = hashes.select(col(idCol), col("simhash"),
      explode(expr(
        """transform(sequence(0, 3),
            b -> struct(b AS band,
                        shiftright(simhash, b * 16) & 65535 AS chunk))"""))
        .as("bc"))
      .select(col(idCol), col("simhash"),
        col("bc.band").as("band"), col("bc.chunk").as("chunk"))
    val a = banded.select(col(idCol).as("id_a"), col("simhash").as("h_a"),
      col("band"), col("chunk"))
    val b = banded.select(col(idCol).as("id_b"), col("simhash").as("h_b"),
      col("band"), col("chunk"))
    a.join(b, Seq("band", "chunk")).filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}

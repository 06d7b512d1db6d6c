package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Explicit Bloom-filter runtime filter: semi-join reduction for joins whose
  * build side is small AFTER filtering but whose probe side is the 100 TB
  * fact table.
  *
  * The scale story: a shuffle join moves EVERY fact row to a reducer before
  * non-matching keys are discarded. When the dim side is selective (say 0.1%
  * of orders), ~99.9% of that exchange is wasted. Building a compact Bloom
  * filter over the dim keys (one distributed aggregation producing a
  * kilobytes-sized bitset), broadcasting it, and pre-filtering the fact scan
  * turns the exchange into O(matching + ε·fact) rows. False positives are
  * removed by the exact join that follows, so results are bit-identical to
  * the plain join — the filter only sheds shuffle volume.
  *
  * Spark's own `InjectRuntimeFilter` rule does this automatically in narrow
  * cases (Spark 3.3+, `spark.sql.optimizer.runtime.bloomFilter.enabled`);
  * this operator makes the reduction explicit and composable: one built
  * filter can prune SEVERAL fact tables (a star schema shares one dim
  * filter), and it applies where the optimizer won't inject (e.g. ahead of
  * an aggregation, a non-equi rerank, or a sink).
  *
  * Everything on the hot path is codegen'd built-ins: `xxhash64` for the
  * double-hashing scheme (Kirsch & Mitzenmacher 2006 — k positions from two
  * hashes), `bit_get` for the membership probe. The only JVM-side code is
  * the bitset-building typed Aggregator, which runs once over the SMALL dim
  * side. The bitset rides into the probe as a one-row broadcast crossJoin —
  * never a driver-side literal (a 16 KiB array literal would bloat every
  * serialized task).
  *
  * No reference analog (the reference is a CDC capture tool); this is the
  * public runtime-filter pattern every warehouse engine ships.
  */
object RuntimeFilter {

  /** Bitset buffer: words(i) holds bits [64i, 64i+64). Case class so the
    * aggregation buffer has a product (columnar) encoder — no kryo blobs.
    */
  final case class Bits(words: Array[Long])

  /** Second-hash seed (any odd constant; fixed so build and probe agree). */
  private val Seed2 = 0x9e3779b97f4a7c15L

  private class BloomAgg(numBits: Int, numHashes: Int)
      extends Aggregator[(Long, Long), Bits, Bits] {
    override def zero: Bits = Bits(new Array[Long](numBits / 64))
    override def reduce(b: Bits, h: (Long, Long)): Bits = {
      // reduce each hash mod m BEFORE combining — the combined value stays
      // tiny, so the identical Column formula below never overflows under
      // ANSI arithmetic (and both sides compute the same positions)
      val m = numBits.toLong
      val r1 = java.lang.Math.floorMod(h._1, m)
      val r2 = java.lang.Math.floorMod(h._2, m)
      var i = 0
      while (i < numHashes) {
        val pos = java.lang.Math.floorMod(r1 + i.toLong * r2, m).toInt
        b.words(pos >>> 6) |= 1L << (pos & 63)
        i += 1
      }
      b
    }
    override def merge(x: Bits, y: Bits): Bits = {
      var i = 0
      while (i < x.words.length) { x.words(i) |= y.words(i); i += 1 }
      x
    }
    override def finish(b: Bits): Bits = b
    override def bufferEncoder: Encoder[Bits] = Encoders.product[Bits]
    override def outputEncoder: Encoder[Bits] = Encoders.product[Bits]
  }

  /** The two probe hashes for `key`. Build and probe MUST hash the same
    * Spark type (xxhash64 is type-sensitive) — [[prune]] casts the fact key
    * to the dim key's type to guarantee it.
    */
  private def hashes(key: Column): (Column, Column) =
    (xxhash64(key), xxhash64(key, lit(Seed2)))

  /** One-row DataFrame holding the Bloom bitset (`_bloom` ARRAY<BIGINT>)
    * over the non-null values of `keys(keyCol)`. Distributed build: each
    * partition folds its rows into a local bitset, merge is a word-wise OR
    * (commutative ⇒ deterministic under any partitioning).
    *
    * `numBits` must be a multiple of 64. Size for the EXPECTED distinct dim
    * keys: ~10 bits/key ⇒ <1% false positives at k=4..6.
    */
  def build(keys: DataFrame, keyCol: String, numBits: Int = 1 << 17,
      numHashes: Int = 5): DataFrame = {
    require(numBits % 64 == 0 && numBits > 0, s"numBits must be a positive multiple of 64: $numBits")
    require(numHashes > 0, s"numHashes must be positive: $numHashes")
    val spark = keys.sparkSession
    import spark.implicits._
    val (h1, h2) = hashes(col(keyCol))
    keys.filter(col(keyCol).isNotNull)
      .select(h1.as("h1"), h2.as("h2")).as[(Long, Long)]
      .groupByKey(_ => 0)
      .agg(new BloomAgg(numBits, numHashes).toColumn.name("b"))
      .select(col("b.words").as("_bloom"))
  }

  /** Membership probe: true iff every double-hash position of `key` is set
    * in `bitset`. All built-ins (`pmod`, `bit_get`) — stays inside
    * whole-stage codegen. Never false for an inserted key.
    */
  def mightContain(bitset: Column, key: Column, numBits: Int = 1 << 17,
      numHashes: Int = 5): Column = {
    val (h1, h2) = hashes(key)
    val m = lit(numBits.toLong)
    // mod-m BEFORE combining: operands stay < numHashes·numBits, so ANSI
    // arithmetic can never overflow (and this matches BloomAgg bit-for-bit)
    val (r1, r2) = (pmod(h1, m), pmod(h2, m))
    (0 until numHashes).map { i =>
      val pos = pmod(r1 + lit(i.toLong) * r2, m)
      bit_get(element_at(bitset, (pos / 64).cast("int") + 1), (pos % 64).cast("int")) === 1
    }.reduce(_ && _)
  }

  /** Fact rows whose `factKey` PROBABLY appears among `dim`'s `dimKey`
    * values: a superset of the true semi-join (no false negatives), smaller
    * than `fact` by ~the dim selectivity. Null fact keys are dropped (they
    * can never equi-join). The bitset reaches every task as a one-row
    * broadcast, not a plan literal.
    */
  def prune(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      numBits: Int = 1 << 17, numHashes: Int = 5): DataFrame = {
    val dimType = dim.schema(dimKey).dataType
    val bits = build(dim.select(col(dimKey)), dimKey, numBits, numHashes)
    fact.crossJoin(broadcast(bits))
      .filter(mightContain(col("_bloom"), col(factKey).cast(dimType), numBits, numHashes))
      .drop("_bloom")
  }

  /** The full reduced join: bloom-prune `fact`, then exact-join — results
    * bit-identical to `fact.join(dim, factKey === dimKey)`, with the
    * fact-side exchange shrunk to the survivors.
    */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, numBits: Int = 1 << 17, numHashes: Int = 5): DataFrame =
    prune(fact, dim, factKey, dimKey, numBits, numHashes)
      .join(dim, col(factKey) === col(dimKey))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.LongType

/** Serializable carrier of a persisted bloom side-file's bytes. The
  * deserialized `BloomFilter` is rebuilt lazily on each JVM the
  * expression lands on (driver for interpreted eval, executors via the
  * task binary); only the bytes travel. Identity is the WHOLE POINT of
  * this wrapper: a corpus-scaled bloom inside a `Literal` makes Catalyst
  * hash and compare the full bit array (tens of MB) on every expression
  * canonicalization/semanticEquals during optimization — measured as a
  * ~4 s per-serve plateau on q_contamination_serve once the ×100 corpus
  * pushed the side-file to the 32 MB cap. A case-class field of array
  * type compares by reference, and [[graft.sources.IndexStore]]
  * memoizes the merged bytes per snapshot, so within a serving JVM every
  * construction of the same snapshot's prefilter is reference-equal. */
final case class BloomRef(bytes: Array[Byte]) {
  @transient lazy val filter: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
}

/** Serializable carrier of a SHARDED bloom family: one bloom per index
  * bucket (the `p<i>` files under each version's `b_<side>` dir,
  * [[graft.sources.IndexStore.bloomFamilyFor]]), probed by routing
  * each key to its shard with the
  * SAME hash Spark's bucketed layout uses (`Murmur3(key) pmod shards`).
  * Sharding is the geometry-saturation fix (r13 verdict): a single
  * per-snapshot bloom hard-caps at 2^28 bits, so past ~28 M keys its
  * fpp degrades until the prefilter passes everything — per-shard
  * geometry scales with the index's bucket count instead (256 shards ×
  * 2^28 bits ≈ 6.7 B keys at ~1 % fpp before any cap binds). Same
  * by-reference identity contract as [[BloomRef]].
  *
  * The family may be PARTIAL (r14 verdict item 1 — arrival-routed
  * residency, [[graft.sources.IndexStore.bloomFamilyForArrival]]): an
  * unloaded shard's slot is null and probing it answers the
  * conservative "might contain". The one-sided-error contract is
  * preserved — `false` still PROVES absence; a null-shard `true` just
  * forwards the key to the exact join behind the prefilter, which
  * drops non-members the same way it drops loaded-shard false
  * positives. A serve that routes its arrival's keys first never hits
  * the fallback (every probed key's shard was loaded); the fallback is
  * the safety net that makes partial loading impossible to misuse. */
final case class BloomFamily(shards: Int,
    bytes: java.util.concurrent.atomic.AtomicReferenceArray[Array[Byte]]) {
  // `bytes` is an AtomicReferenceArray, not a plain array: the memoized
  // family's slots fill IN PLACE as serves touch more shards (under
  // IndexStore's lock) while probe threads read them with no common
  // monitor — a plain-array store is an UNSAFE PUBLICATION (a reader
  // could observe the reference before the byte contents, handing
  // BloomFilter.readFrom torn state → spurious IOExceptions or, worst,
  // a false negative that breaks the one-sided-error contract). The
  // volatile set/get pair gives the happens-before edge (r15 review).

  /** Deserialize the CURRENTLY loaded slots — one fresh array per call.
    * Codegen hoists the result once per generated-class instance, and
    * an executor-side instance's `bytes` are a serialization-time
    * snapshot, so that hoist is exact. Deliberately NOT a cached
    * `lazy val`: a whole-array cache forced while the family was
    * PARTIAL would freeze the unloaded shards at the conservative
    * fallback forever — every later driver-side probe of an upgraded
    * shard would keep passing its non-members (r15 review). */
  def filters(): Array[org.apache.spark.util.sketch.BloomFilter] =
    Array.tabulate(bytes.length()) { i =>
      val b = bytes.get(i)
      if (b == null) null
      else org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(b))
    }

  /** Per-SLOT deserialization cache for the row-at-a-time driver path:
    * a null (unloaded) slot is re-checked against `bytes` on every
    * probe — cheap, and it picks up in-place upgrades immediately —
    * while a loaded slot deserializes once. Racing fills are idempotent
    * and safely published (volatile slots). */
  @transient private lazy val slotCache =
    new java.util.concurrent.atomic.AtomicReferenceArray[
      org.apache.spark.util.sketch.BloomFilter](bytes.length())

  private def filterAt(i: Int): org.apache.spark.util.sketch.BloomFilter = {
    val b = bytes.get(i)
    if (b == null) null
    else {
      var f = slotCache.get(i)
      if (f == null) {
        f = org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(b))
        slotCache.set(i, f)
      }
      f
    }
  }

  def mightContainLong(h: Long): Boolean = {
    val f = filterAt(BloomFamily.shardOf(h, shards))
    f == null || f.mightContainLong(h)
  }

  /** Bytes actually resident (loaded shards only) — the quantity
    * arrival-routed loading bounds by the ARRIVAL instead of the
    * index (probe tooling records it per serve). */
  def loadedBytes: Long = {
    var s = 0L
    var i = 0
    while (i < bytes.length()) {
      val b = bytes.get(i)
      if (b != null) s += b.length
      i += 1
    }
    s
  }

  def loadedShards: Int = {
    var n = 0
    var i = 0
    while (i < bytes.length()) {
      if (bytes.get(i) != null) n += 1
      i += 1
    }
    n
  }
}

object BloomFamily {
  /** Fully-loaded family from plain slot arrays (hand-built families
    * in tests; production families share IndexStore's memoized
    * AtomicReferenceArray directly). */
  def apply(shards: Int, slots: Array[Array[Byte]]): BloomFamily = {
    val a = new java.util.concurrent.atomic.AtomicReferenceArray[
      Array[Byte]](slots.length)
    var i = 0
    while (i < slots.length) { a.set(i, slots(i)); i += 1 }
    BloomFamily(shards, a)
  }

  /** Shard routing: Spark's bucketing hash (`Murmur3_x86_32.hashLong`,
    * seed 42) pmod the shard count — one bloom shard per index bucket,
    * so the family's layout IS the index's. Build and probe must agree
    * bit-for-bit (spec-pinned); codegen inlines this exact formula. */
  def shardOf(h: Long, n: Int): Int = {
    val x = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(h, 42) % n
    if (x < 0) x + n else x
  }
}

/** `might_contain(bloom, key)` over a PERSISTED bloom's bytes, as a
  * native codegen expression — the serve-path sibling of Spark's
  * `BloomFilterMightContain`, which expects its bloom as a foldable
  * child expression and therefore pays Literal's value-based
  * hashCode/equals over the full array (see [[BloomRef]]). One-sided
  * error is the contract: `false` proves the key is absent from the
  * index, `true` goes on to the exact join.
  *
  * PLACEMENT CONSTRAINT: use only inside Filter/Project (the serve
  * paths do) — `deterministic = false` below makes join conditions and
  * aggregate expressions fail analysis by design. */
case class BloomMightContain(child: Expression, bloom: BloomRef)
    extends UnaryExpression with Predicate {
  override def prettyName: String = "graft_bloom_might_contain"

  /** Functionally this IS deterministic; the flag is a constraint-
    * propagation fence. `InferFiltersFromConstraints` copies a
    * deterministic probe-side predicate across the serve join's key
    * equality onto the INDEX side — where a bloom over the index's own
    * keys rejects NOTHING (no false negatives), so the inferred filter
    * is a pure per-index-row probe of a corpus-scaled bit array (two
    * hashes + two random reads into up to 32 MB, per row, per serve).
    * Constraints only collect deterministic predicates
    * (QueryPlan.validConstraints), so this keeps the prefilter exactly
    * where the serve path places it: on the arriving shard. The cost is
    * that the optimizer also won't reorder it with neighboring filters
    * — it has none; it sits directly on the shingle derivation.
    * Plan-shape-gated in PlanSpec ("bloom must prefilter the shard,
    * not the index"). */
  override lazy val deterministic: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects BIGINT, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    bloom.filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomRef].getName)
    // hoist the deserialized filter into instance state initialized once
    // per generated-class instance — the lazy `filter()` accessor costs
    // a volatile initialized-check per row on the hot path otherwise
    val f = ctx.addMutableState(
      "org.apache.spark.util.sketch.BloomFilter", "graftBloomFilter",
      v => s"$v = $ref.filter();")
    defineCodeGen(ctx, ev, c => s"$f.mightContainLong($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

/** Sharded-family sibling of [[BloomMightContain]]: routes the key to
  * its bucket's bloom (`Murmur3 pmod shards` — the index's own layout)
  * and probes only that shard's bit array. Same one-sided-error
  * contract, same `deterministic = false` constraint-propagation fence,
  * same Filter/Project-only placement constraint. */
case class BloomFamilyMightContain(child: Expression, family: BloomFamily)
    extends UnaryExpression with Predicate {
  override def prettyName: String = "graft_bloom_family_might_contain"

  /** Constraint-propagation fence — see [[BloomMightContain
    * .deterministic]]; the rationale transfers verbatim (an inferred
    * index-side copy of the prefilter rejects nothing and probes a
    * shard bloom per index row per serve). */
  override lazy val deterministic: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_family_might_contain expects BIGINT, " +
        s"got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    family.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomFamily", family,
      classOf[BloomFamily].getName)
    // deserialize every loaded shard ONCE per instance; per row the
    // probe is murmur + pmod + one array index + two bit reads (plus a
    // null check — the partial-family conservative fallback)
    val fs = ctx.addMutableState(
      "org.apache.spark.util.sketch.BloomFilter[]", "graftBloomShards",
      v => s"$v = $ref.filters();")
    val n = family.shards
    // inline shardOf: codegen must match the build's routing bit-for-bit
    nullSafeCodeGen(ctx, ev, c => {
      val idx = ctx.freshName("graftShardIdx")
      s"""
         |int $idx = org.apache.spark.unsafe.hash.Murmur3_x86_32
         |  .hashLong($c, 42) % $n;
         |if ($idx < 0) $idx += $n;
         |${ev.value} =
         |  $fs[$idx] == null || $fs[$idx].mightContainLong($c);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomFamilyMightContain = copy(child = newChild)
}

object BloomOps {
  /** Prefilter column: true iff `key` (BIGINT) might be in the persisted
    * bloom whose serialized bytes are `bytes`. */
  def mightContainLong(key: Column, bytes: Array[Byte]): Column =
    Bridge.column(BloomMightContain(Bridge.expression(key), BloomRef(bytes)))

  /** Prefilter column over a sharded bloom family (one bloom per index
    * bucket): true iff `key` (BIGINT) might be in the family's index. */
  def familyMightContainLong(key: Column, family: BloomFamily): Column =
    Bridge.column(
      BloomFamilyMightContain(Bridge.expression(key), family))
}

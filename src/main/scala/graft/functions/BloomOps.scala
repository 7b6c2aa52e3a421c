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
  * type compares by reference, and [[graft.sources.IndexStore.bloomFor]]
  * memoizes the merged bytes per snapshot, so within a serving JVM every
  * construction of the same snapshot's prefilter is reference-equal. */
final case class BloomRef(bytes: Array[Byte]) {
  @transient lazy val filter: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
}

/** `might_contain(bloom, key)` over a PERSISTED bloom's bytes, as a
  * native codegen expression — the serve-path sibling of Spark's
  * `BloomFilterMightContain`, which expects its bloom as a foldable
  * child expression and therefore pays Literal's value-based
  * hashCode/equals over the full array (see [[BloomRef]]). One-sided
  * error is the contract: `false` proves the key is absent from the
  * index, `true` goes on to the exact join. */
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
    defineCodeGen(ctx, ev, c => s"$ref.filter().mightContainLong($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

object BloomOps {
  /** Prefilter column: true iff `key` (BIGINT) might be in the persisted
    * bloom whose serialized bytes are `bytes`. */
  def mightContainLong(key: Column, bytes: Array[Byte]): Column =
    Bridge.column(BloomMightContain(Bridge.expression(key), BloomRef(bytes)))
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Native Catalyst expressions for the hot hash paths.
  *
  * The same semantics are expressible with higher-order builtins
  * (transform/aggregate lambdas — see graft.text.TextFns), but those
  * evaluate interpreted, one function call per element. These
  * expressions run the loops in generated Java inside whole-stage
  * codegen: ~10-30× faster on the dedup pipeline, while remaining
  * bit-identical to the DuckDB oracle mirrors.
  */

/** Polynomial rolling hash over code points:
  * fold (acc*31 + codepoint) mod 1e9+7. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"polyhash needs a string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHash.hash($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val P = 1000000007L
  /** Referenced from generated code — keep public + static-reachable. */
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      acc = (acc * 31 + cp) % P
    }
    acc
  }
}

/** MinHash signature: for hash family h_i(x) = (x*(1+2i) + i*12289)
  * mod 1e9+7, the element-wise minimum over an array of shingle
  * hashes, for i in [0, nHashes). Returns array<long> (null elements
  * never occur; an empty input yields an all-null signature, matching
  * array_min of an empty array). */
case class MinHashSig(child: Expression, nHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(LongType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"minhash_sig needs array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toLongArray()
    new GenericArrayData(MinHashSig.sig(arr, nHashes).asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.functions.MinHashSig.sig($c.toLongArray(), $nHashes));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val P = 1000000007L
  def sig(hashes: Array[Long], nHashes: Int): Array[java.lang.Long] = {
    val out = new Array[java.lang.Long](nHashes)
    if (hashes.isEmpty) return out // all null
    var i = 0
    while (i < nHashes) {
      val a = 1L + 2L * i
      val b = i * 12289L
      var best = Long.MaxValue
      var j = 0
      while (j < hashes.length) {
        val v = (hashes(j) * a + b) % P
        if (v < best) best = v
        j += 1
      }
      out(i) = best
      i += 1
    }
    out
  }
}

object GraftFunctions {
  /** Register the graft SQL functions on a session (idempotent), so
    * expression strings can call graft_polyhash / graft_minhash_sig. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_polyhash",
      (args: Seq[Expression]) => PolyHash(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      (args: Seq[Expression]) => MinHashSig(args.head,
        args(1).eval().asInstanceOf[Number].intValue()), "built-in")
  }
}

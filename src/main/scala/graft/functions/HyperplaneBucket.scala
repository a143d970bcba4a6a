package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Random-hyperplane LSH bucket id: bit p of the result is the sign of
  * `v · plane_p`. One pass over the vector for all planes (the
  * composed formulation — `element_at(v, j) * lit(w)` summed per plane —
  * costs planes × dims expression-tree nodes per row).
  *
  * The plane matrix is a constructor argument (generated from a fixed
  * seed by the caller) carried into generated code as a reference
  * object, so the loop JITs with the expression. */
case class HyperplaneBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 30)

  override def dataType: DataType = IntegerType

  // getFloat on a non-float array silently reads garbage — fail analysis
  // instead (mirrors CosineSimilarity's input validation)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_bucket needs array<float>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    HyperplaneBucket.bucket(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneBucket.bucket($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucket {
  /** Static so generated code calls it directly. */
  def bucket(v: ArrayData, planes: Array[Array[Double]]): Int = {
    val n = v.numElements()
    var b = 0
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dot = 0.0
      var j = 0
      val m = math.min(n, plane.length)
      while (j < m) { dot += v.getFloat(j).toDouble * plane(j); j += 1 }
      if (dot > 0) b |= (1 << p)
      p += 1
    }
    b
  }

  def hyperplaneBucket(c: Column, planes: Array[Array[Double]]): Column =
    GraftSqlBridge.column(
      HyperplaneBucket(GraftSqlBridge.expression(c), planes))
}

package graft.plans

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Euclidean (L2) distance over two `array<double>` columns as a NATIVE
  * codegen'd Catalyst expression — the distance twin of [[CosineSim]].
  *
  * Replaces the `sqrt(aggregate(zip_with(a, b, (x,y) => (x-y)²), 0.0,
  * _+_))` HOF chain, which is CodegenFallback (interpreted eval) AND
  * allocates an intermediate array per row — the dominant cost of every
  * argmin cell-assignment scan (vectors × centroids calls). The fused
  * loop accumulates the squared diffs in the SAME left-to-right order
  * as the HOF fold, so results are bit-identical and DuckDB oracle
  * parity (ROUND(list_distance, 6)) is preserved.
  *
  * NULL when either side is null, lengths differ, or an element is null
  * (zip_with null-pads the shorter side and a null poisons the fold —
  * matched exactly). Empty arrays → distance 0.0, like the HOF.
  */
case class L2Dist(left: Expression, right: Expression) extends BinaryExpression {

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"l2_dist expects (array<double>, array<double>), " +
          s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Null elements only need runtime checks when the schema admits them.
    * lazy val: the interpreted path calls this per element per row, and
    * the two dataType casts + field reads must not run there. */
  private lazy val mayHaveNullElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (mayHaveNullElems && (xs.isNullAt(i) || ys.isNullAt(i))) return null
      val d = xs.getDouble(i) - ys.getDouble(i)
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val nullElemCheck =
        if (mayHaveNullElems)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemCheck
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = java.lang.Math.sqrt($acc); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Dist =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "l2_dist"
}

object L2Dist {
  /** Column API. */
  def apply(a: Column, b: Column): Column =
    GraftSql.column(L2Dist(GraftSql.expression(a), GraftSql.expression(b)))
}

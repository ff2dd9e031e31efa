package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression: Morton (Z-curve) bit interleave of two
  * non-negative bucket ranks — the sort key behind
  * [[graft.sinks.Sinks.writeZOrdered]] (SURVEY.md §2.10 option (b),
  * second native expression next to [[CosineSimilarity]]).
  *
  * Bit i of `a` lands at output bit 2i+1, bit i of `b` at 2i, for the
  * low `bits` bits of each input — files sorted by the result cover
  * small rectangles of (a, b) space, which is what makes parquet
  * min/max stats prune on either column. The composed-built-ins form
  * (a 2·bits-deep shiftleft/shiftright/plus tree) computes the same
  * value; this collapses it to one tight generated loop on the
  * archive-write hot path — at 100 TB the z-order write touches every
  * row, so the sort-key expression is worth native codegen.
  *
  * `bits` arrives as a foldable int literal (SQL:
  * `morton_interleave(a, b, 8)`); inputs are LONG bucket ranks already
  * clamped to [0, 2^bits) by the caller — higher bits are ignored by
  * construction (only the low `bits` are read).
  */
case class MortonInterleave(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType &&
        bits >= 1 && bits <= 31)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"morton_interleave expects (bigint, bigint, 1<=bits<=31), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}" +
          s", bits=$bits")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i + 1)
      z |= ((y >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($a >> $i) & 1L) << (2 * $i + 1);
         |  $z |= (($b >> $i) & 1L) << (2 * $i);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonInterleave =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "morton_interleave"
}

object MortonInterleave {
  val registration: (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => Expression) = (
    new FunctionIdentifier("morton_interleave"),
    new ExpressionInfo(classOf[MortonInterleave].getName,
      "morton_interleave"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        "morton_interleave(a, b, bits) takes three arguments")
      val bits = children(2) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"morton_interleave bits must be an int literal, got $other")
      }
      MortonInterleave(children.head, children(1), bits)
    })
}

package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two float/double array
  * columns, with whole-stage-codegen support (SURVEY.md §2.10 option (b)).
  *
  * This is the codegen'd alternative to (a) composing
  * `aggregate(zip_with(...))` built-ins and strictly dominates (c) a Scala
  * UDF: no Seq boxing, no serialization round-trip — the generated Java
  * reads primitives straight out of Tungsten ArrayData inside the stage
  * loop. Accumulation is left-to-right in double, matching
  * VectorOps.cosine and DuckDB's list_cosine_similarity over DOUBLE[].
  *
  * Registered as SQL function `cosine_sim` via [[GraftExtensions]]:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)          // or
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  *   ...
  *   spark.sql("SELECT cosine_sim(a.embedding, b.embedding) ...")
  * }}}
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // produces NULL for ragged lengths / null elements even when both
  // inputs are non-null — without this the planner treats the output as
  // non-nullable and the NULL degenerates to garbage 0.0
  override def nullable: Boolean = true

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double> args, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def elemIsDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Mismatched lengths or null elements → NULL result (silently
    * truncating to min(n) or reading masked-null slots as 0.0 would
    * return a plausible-but-wrong similarity on ragged/corrupt vectors;
    * DuckDB's list_cosine_similarity errors on the length case).
    */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lx = elemIsDouble(left); val ly = elemIsDouble(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (lx) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (ly) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getX = if (elemIsDouble(left)) "getDouble" else "getFloat"
    val getY = if (elemIsDouble(right)) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = (double) $a.$getX($i);
         |    double $yi = (double) $b.$getY($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object GraftFunctions {
  val cosineSim: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) =>
      CosineSimilarity(children.head, children(1)))

  /** Runtime registration into an existing session (the extension below
    * only applies at session build time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .registerFunction(cosineSim._1, cosineSim._2, cosineSim._3)
    spark.sessionState.functionRegistry.registerFunction(
      MortonInterleave.registration._1, MortonInterleave.registration._2,
      MortonInterleave.registration._3)
  }
}

/** Session extension injecting graft's native functions into the Catalyst
  * function registry (SURVEY.md §2.10). Usable via
  * `spark.sql.extensions=graft.functions.GraftExtensions` on any cluster —
  * no code changes to queries, plain SQL `cosine_sim(a, b)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.cosineSim)
    ext.injectFunction(MortonInterleave.registration)
  }
}

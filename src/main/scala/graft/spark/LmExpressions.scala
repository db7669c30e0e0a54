package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The fitted bigram language model consumed by [[LmScore]]: capped
  * unigram/bigram count tables as UTF8String-keyed hash maps (probed
  * directly with the scan's UTF8String tokens — no per-token String
  * decode), the UNCAPPED corpus token total, and the stupid-backoff
  * factor.
  *
  * This object is the broadcast-variable analogue: at 100 TB the same
  * two capped maps (bounded by VocabK/BigramK, NOT by corpus size) ship
  * to every executor once inside the serialized plan, and scoring stays
  * a map-only projection — the alternative (exploding the corpus into
  * (doc, pos, token) rows and joining the count tables back, then
  * re-assembling per doc) shuffles ~20 B per corpus TOKEN, which at
  * 100 TB is a corpus-sized exchange for a lookup the model fits in a
  * few MB.
  */
final class LmModel(
    val uni: java.util.HashMap[UTF8String, java.lang.Long],
    val big: java.util.HashMap[UTF8String, java.lang.Long],
    val total: Double,
    val backoff: Double) extends Serializable {

  private val space = UTF8String.fromString(" ")

  /** Fold the document's token array left-to-right (ascending position —
    * the SAME summation order as the DuckDB mirror's
    * `list_reduce(list(lp ORDER BY i))`, so the IEEE accumulation
    * sequence is identical on both sides):
    *
    *   p(w_i | w_{i-1}) = c2(w_{i-1} w_i) / c1(w_{i-1})   both in tables
    *                    | backoff · (c1(w_i) / total)      w_i in vocab
    *                    | backoff / total                  OOV floor
    *
    * Returns (lp_sum = Σ ln p, hits2 = bigram-table hits, oov = tokens
    * outside the capped vocab). NULL array elements (legal for the SQL
    * surface even though the t27 tokenizer never produces them) are
    * scored deterministically as OOV — checked via isNullAt, because the
    * physical encodings disagree on what getUTF8String returns for a
    * null slot (GenericArrayData: null; UnsafeArrayData: undefined).
    */
  def score(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    def tok(i: Int): UTF8String =
      if (toks.isNullAt(i)) null else toks.getUTF8String(i)
    var sum = 0.0
    var hits = 0L
    var oov = 0L
    var i = 0
    while (i < n) {
      val w = tok(i)
      if (w == null || uni.get(w) == null) oov += 1
      i += 1
    }
    i = 1
    while (i < n) {
      val w1 = tok(i - 1)
      val w2 = tok(i)
      val bc =
        if (w1 != null && w2 != null) big.get(UTF8String.concat(w1, space, w2))
        else null
      val uc1 = if (w1 != null) uni.get(w1) else null
      if (bc != null && uc1 != null) {
        sum += Math.log(bc.doubleValue() / uc1.doubleValue())
        hits += 1L
      } else {
        val uc2 = if (w2 != null) uni.get(w2) else null
        sum +=
          (if (uc2 != null) Math.log(backoff * (uc2.doubleValue() / total))
           else Math.log(backoff / total))
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](sum, hits, oov))
  }

  // Keep plan strings (explain / toString) free of the map contents.
  override def toString: String =
    s"LmModel(uni=${uni.size}, big=${big.size}, total=$total, backoff=$backoff)"
}

/** `lm_score(toks)` — per-document stupid-backoff bigram LM statistics
  * as `struct<lp_sum double, hits2 bigint, oov bigint>`, evaluated in
  * one pass over the token array inside the scan stage. The model rides
  * along as a codegen reference object ([[LmModel]]); the generated code
  * is a single virtual call into its compiled loop, so the projection
  * stays inside whole-stage codegen with no encoder boundary.
  */
case class LmScore(child: Expression, model: LmModel) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("lp_sum", DoubleType, nullable = false),
    StructField("hits2", LongType, nullable = false),
    StructField("oov", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lm_score expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    model.score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("lmModel", model, classOf[LmModel].getName)
    nullSafeCodeGen(ctx, ev, toks => code"${ev.value} = $m.score($toks);".toString)
  }

  override protected def withNewChildInternal(newChild: Expression): LmScore =
    copy(child = newChild)

  override def prettyName: String = "lm_score"

  // The default case-class toString would render the model's maps into
  // every plan string; keep it to the child + the model's summary.
  override def toString: String = s"lm_score($child)"
}

object LmExpressions {
  /** Register `lm_score` bound to the given fitted model (idempotent —
    * re-registering rebinds to the newest model, which is what repeated
    * query construction in one session wants).
    */
  def register(spark: SparkSession, model: LmModel): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("lm_score"),
      new ExpressionInfo(classOf[LmScore].getName, "lm_score"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "lm_score(toks) takes 1 argument")
        LmScore(args.head, model)
      })
}

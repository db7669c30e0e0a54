package graft.spark

import java.util.zip.Deflater

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `deflate_len(text)` — DEFLATE-compressed byte length of the UTF-8
  * text at a FIXED level, the cheap compressibility quality signal
  * (templated/repeated boilerplate compresses far below prose; near-1
  * ratios flag scrambled or binary-ish payloads). One pass per row
  * inside whole-stage codegen; a thread-local [[Deflater]] is reset per
  * row, so the native zlib stream is allocated once per executor
  * thread, not per document.
  *
  * Determinism contract: DEFLATE output length is a pure function of
  * (bytes, level, strategy, library build). The sandbox's driver
  * recompute shares the JVM with the executors, so the t34 oracle is
  * byte-exact; a production deployment pins the JDK (its bundled zlib)
  * per corpus release, same as it pins the tokenizer — and the SIGNAL
  * (the ratio's ordering of documents) is robust to library drift even
  * when absolute lengths move by a few bytes.
  */
object CompressExpressions {

  /** Fixed compression level: zlib's default (6) — the level the
    * compressibility-filter literature implicitly measures; lower levels
    * trade a little discriminative sharpness for ~3× throughput, which a
    * 100 TB run may prefer, but the level is part of the signal's
    * definition so it is a constant here, not a knob.
    */
  val Level = 6

  /** One Deflater per executor task thread, deliberately never end()'d
    * (ADVICE r06 — documented lifetime): task threads are pooled and
    * long-lived, so each native zlib stream is reused across every task
    * the thread runs; if a thread DOES die, the JDK's own Cleaner on
    * java.util.zip.Deflater (JDK 9+) frees the native state once the
    * ThreadLocal entry becomes unreachable — bounded either way, no
    * unreleased allocation outlives its thread's GC horizon.
    */
  private val local: ThreadLocal[(Deflater, Array[Byte])] =
    new ThreadLocal[(Deflater, Array[Byte])] {
      override def initialValue(): (Deflater, Array[Byte]) =
        (new Deflater(Level), new Array[Byte](16 * 1024))
    }

  /** Compressed length of the string's UTF-8 bytes (zlib-wrapped
    * stream). Called from generated code — keep the signature stable.
    */
  def deflatedLength(s: UTF8String): Long = {
    val (d, buf) = local.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "deflate_len(text) takes 1 argument")
        DeflateLen(args.head)
      })
}

case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"deflate_len expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CompressExpressions.deflatedLength(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      code"${ev.value} = graft.spark.CompressExpressions.deflatedLength($s);".toString)

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)

  override def prettyName: String = "deflate_len"
}

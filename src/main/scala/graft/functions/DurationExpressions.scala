package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Strict parser for YouTube's ISO-8601 duration strings.
  *
  * The reference carries `contentDetails.duration` opaque ("PT1M47S",
  * youtube_api_handler.py:769) and never parses it; SURVEY §7.3 calls
  * out a native parse expression as the one worthwhile scalar addition
  * (duration-based shorts/long classification needs it). Grammar
  * accepted (anchored, digits only, fixed component order):
  *
  *   P [nW] [nD] [T [nH] [nM] [nS]]
  *
  * Returns total seconds; NULL for null input, any deviation from the
  * grammar, or a grammar-valid string with no numeric component ("P",
  * "PT") — exactly the rows DuckDB's anchored regexp
  * `^P(?:(\d+)W)?(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?)?$`
  * leaves with all capture groups empty, so oracle SQL can mirror the
  * semantics with regexp_extract.
  */
object YtDurationUtil {
  /** @return total seconds, or -1 for "SQL NULL" (no valid duration is
    *         negative, so -1 is a safe sentinel for codegen). */
  def parse(input: UTF8String): Long = {
    if (input == null) return -1L
    val s = input.toString
    val n = s.length
    if (n < 2 || s.charAt(0) != 'P') return -1L
    var i = 1
    var total = 0L
    var components = 0
    var inTime = false
    // date part: W then D; time part (after 'T'): H then M then S.
    // `stage` enforces the fixed order: 0=W,1=D (date) / 0=H,1=M,2=S.
    var stage = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == 'T') {
        if (inTime) return -1L
        inTime = true
        stage = 0
        i += 1
      } else if (c >= '0' && c <= '9') {
        var v = 0L
        while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
          v = v * 10 + (s.charAt(i) - '0')
          if (v > 100000000000L) return -1L // overflow guard
          i += 1
        }
        if (i >= n) return -1L // digits with no unit
        val unit = s.charAt(i)
        i += 1
        val mult =
          if (!inTime) unit match {
            case 'W' if stage <= 0 => stage = 1; 604800L
            case 'D' if stage <= 1 => stage = 2; 86400L
            case _ => return -1L
          } else unit match {
            case 'H' if stage <= 0 => stage = 1; 3600L
            case 'M' if stage <= 1 => stage = 2; 60L
            case 'S' if stage <= 2 => stage = 3; 1L
            case _ => return -1L
          }
        total += v * mult
        components += 1
      } else return -1L
    }
    if (components == 0) -1L else total
  }
}

/** `parse_yt_duration(str)`: codegen'd scalar wrapping
  * [[YtDurationUtil.parse]] — one linear char scan per row, staying
  * inside the surrounding WholeStageCodegen stage (the regexp_extract
  * alternative runs six anchored regex matches per row).
  */
case class ParseYtDuration(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"parse_yt_duration expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_yt_duration"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val r = YtDurationUtil.parse(v.asInstanceOf[UTF8String])
      if (r < 0) null else r
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val util = YtDurationUtil.getClass.getName.stripSuffix("$")
    val r = ctx.freshName("secs")
    ev.copy(code =
      code"""
            |${childGen.code}
            |boolean ${ev.isNull} = true;
            |long ${ev.value} = -1L;
            |if (!${childGen.isNull}) {
            |  long $r = $util.parse(${childGen.value});
            |  if ($r >= 0L) { ${ev.isNull} = false; ${ev.value} = $r; }
            |}
          """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

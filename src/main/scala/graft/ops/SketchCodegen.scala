package graft.ops

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._

/** Bench A/B seam for the sketch/banding expressions' codegen (round 19):
  * with `interpretedForBench` set, every graft expression's `doGenCode`
  * emits the CodegenFallback-equivalent shape — a boxed `eval(INPUT_ROW)`
  * through an object reference, children evaluated interpreted — instead
  * of its static-call fused code. Combined with
  * `spark.sql.codegen.wholeStage=false` this reproduces the pre-r18
  * execution shape exactly (unfused projection + interpreted expression),
  * so the bench's `sketch_codegen_ab` probe can measure what the r18
  * codegen work buys on a compute-dominant corpus. NEVER set outside a
  * single-threaded bench/profile section: the flag is read at codegen
  * time and applies to every plan compiled while it is on.
  *
  * The fallback shape requires a row-at-a-time context (`INPUT_ROW`);
  * inside whole-stage codegen (`currentVars` bound) the seam quietly
  * yields the fused code — the A/B always pairs the flag with
  * wholeStage=false, where the guard never fires. */
object SketchCodegen {
  @volatile var interpretedForBench: Boolean = false

  def gen(ctx: CodegenContext, ev: ExprCode, e: Expression)(
      fused: => ExprCode): ExprCode =
    if (!interpretedForBench || ctx.currentVars != null ||
        ctx.INPUT_ROW == null) fused
    else {
      // CodegenFallback.doGenCode's exact shape (nullable branch)
      val idx = ctx.references.length
      ctx.references += e
      val objectTerm = ctx.freshName("obj")
      val javaType = CodeGenerator.javaType(e.dataType)
      ev.copy(code = code"""
        Object $objectTerm = ((org.apache.spark.sql.catalyst.expressions.Expression) references[$idx]).eval(${ctx.INPUT_ROW});
        boolean ${ev.isNull} = $objectTerm == null;
        $javaType ${ev.value} = ${CodeGenerator.defaultValue(e.dataType)};
        if (!${ev.isNull}) {
          ${ev.value} = (${CodeGenerator.boxedType(e.dataType)}) $objectTerm;
        }""")
    }
}

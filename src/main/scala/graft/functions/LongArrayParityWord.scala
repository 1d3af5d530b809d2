package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd lane-parity word over an array<long> column: packs the
  * low bit of lanes [64·w, 64·w+64) into one long (shift-left fold, lane
  * 64·w first = most significant). Feeds the Verifier's slim prune, whose
  * equal-lane upper bound is `numPerms − Σ popcount(parity_a ⊕ parity_b)`.
  *
  * Why not `aggregate(slice(minhash, w*64+1, 64), 0L, (acc, x) ->
  * shiftleft(acc,1) | (x & 1))`: higher-order functions are interpreted and
  * run once per signature row per join side — the same non-codegen tax the
  * repo's equal-lane-count expression exists to avoid (CLAUDE.md rule).
  */
case class LongArrayParityWord(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(arr: Any, word: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val w = word.asInstanceOf[Int]
    val start = w * 64
    val end = math.min(start + 64, a.numElements())
    var acc = 0L
    var i = start
    while (i < end) {
      acc = (acc << 1) | (a.getLong(i) & 1L)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, w) => {
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val acc = ctx.freshName("acc")
      s"""
         |int $end = java.lang.Math.min($w * 64 + 64, $a.numElements());
         |long $acc = 0L;
         |for (int $i = $w * 64; $i < $end; $i++) {
         |  $acc = ($acc << 1) | ($a.getLong($i) & 1L);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongArrayParityWord {
  /** Column API: parity word `w` (64 lanes) of a long-array column. */
  def parityWord(arr: Column, w: Column): Column =
    Bridge.column(LongArrayParityWord(Bridge.expression(arr), Bridge.expression(w)))
}

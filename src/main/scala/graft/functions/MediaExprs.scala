package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ExprBridge.{toColumn => toCol, toExpression => toExpr}
import org.apache.spark.sql.types._

/** Perceptual-signature kernel for the multimodal dedup path.
  *
  * Real media pipelines dedup near-identical assets (one re-encode,
  * resize, or metadata tweak defeats a byte hash) on perceptual
  * signals — blockhash/dHash for images, chroma fingerprints for
  * audio. The signal extractor here is the classic BLOCKHASH shape
  * (Yang et al., "Block mean value based image perceptual hashing"):
  * partition the decoded sample stream into 64 contiguous blocks and
  * emit one bit per block — 1 iff the block's mean exceeds the global
  * mean — so small local perturbations flip only the few bits whose
  * block mean sits near the global mean, while unrelated payloads
  * land ~32 bits apart (random). Exact integer arithmetic
  * (`block_sum · L > total · block_len` — no float means), so the
  * signature is bit-reproducible across engines and replayable in the
  * DuckDB oracle.
  *
  * The container has no media codecs, so the "decoded sample stream"
  * is the [[graft.operators.Multimodal.StubDecoder]] pixel model: the
  * payload bytes themselves (unsigned). A real deployment decodes to
  * luma/PCM first and feeds THIS SAME kernel — the seam is the
  * decoder, not the hash.
  *
  * Overflow bound: `block_sum · L ≤ 255·L²` — exact through
  * `L < ~190 MB` per payload, far above any sane single-asset size
  * (guarded: larger payloads raise rather than wrap).
  */
object MediaOps {

  /** 64-bit blockhash of a byte payload (empty → 0). Block i covers
    * positions `p` with `(p·64) div L = i` — balanced to within one
    * byte, every position covered; empty blocks (L < 64) compare
    * 0 > 0 and contribute a 0 bit.
    */
  def blockHash64(content: Array[Byte]): Long = {
    val L = content.length
    if (L == 0) return 0L
    require(L <= 190000000,
      s"blockHash64: payload of $L bytes would overflow the exact " +
        "integer mean comparison (bound ~190 MB)")
    val sums = new Array[Long](64)
    val lens = new Array[Long](64)
    var total = 0L
    var p = 0
    while (p < L) {
      val v = content(p) & 0xff
      val blk = ((p.toLong * 64L) / L).toInt
      sums(blk) += v
      lens(blk) += 1L
      total += v
      p += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (sums(i) * L > total * lens(i)) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

/** block_hash64(binary) → bigint: codegen'd perceptual signature. */
case class BlockHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(c: Any): Any =
    MediaOps.blockHash64(c.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MediaOps.blockHash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MediaExprs {
  def blockHash64(content: Column): Column =
    toCol(BlockHash64Expr(toExpr(content)))
}

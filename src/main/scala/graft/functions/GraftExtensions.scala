package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions under SQL names so `spark.sql` / pure-SQL users reach
  * them without the Column API —
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *   SELECT cosine_similarity(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * The Column API (`CosineSimilarity(colA, colB)` etc.) does NOT need
  * this — it builds expressions directly and works on any session; the
  * extension is additive SQL surface only, so `SparkEntry` never
  * depends on it (the driver's smoke session has no extensions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, null, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info(classOf[CosineSimilarity], "cosine_similarity"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_similarity(arrA, arrB)")
        CosineSimilarity(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("bitmap_intersect_count"),
      info(classOf[BitmapIntersectCount], "bitmap_intersect_count"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "bitmap_intersect_count(bitsA, bitsB)")
        BitmapIntersectCount(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("indices_to_bitmap"),
      info(classOf[IndicesToBitmap], "indices_to_bitmap"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "indices_to_bitmap(idxs, width)")
        IndicesToBitmap(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      info(classOf[RollingHash], "rolling_hash"),
      (children: Seq[Expression]) => children.size match {
        case 1 => RollingHash(children.head, 31, 1000000007L)
        case _ => throw new IllegalArgumentException("rolling_hash(str)")
      }))
  }
}

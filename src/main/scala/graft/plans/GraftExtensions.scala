package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BigramCounts, CosineSimilarity, DotProduct, Md5BucketScore, Md5MinHash, Shingles, SimHash64, TokenGramHashes, WinnowFingerprints, XxMinHashBands}

/** Session-extension entry point (`spark.sql.extensions=graft.plans.
  * GraftExtensions`) injecting the native vector expressions as SQL
  * functions — the (c)-tier extension mechanism from the build brief:
  * custom Catalyst Expressions registered via SparkSessionExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.injections.foreach(ext.injectFunction)
    // SQL DML over graft catalog tables (MERGE INTO / UPDATE / DELETE) —
    // post-hoc so the commands arrive fully resolved (stars expanded,
    // assignments aligned) before the rewrite fires.
    ext.injectPostHocResolutionRule(s => new GraftDmlRule(s))
    // Delta's utility statements (DESCRIBE HISTORY / OPTIMIZE / VACUUM /
    // RESTORE) + table-valued CDC/history reads.
    ext.injectParser((s, delegate) => new GraftSqlParser(s, delegate))
    GraftTableFunctions.injections.foreach(ext.injectTableFunction)
  }
}

/** The same registrations, applicable to an already-built session (the
  * driver contract hands us sessions we didn't configure).
  */
object GraftFunctions {
  type Injection = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val injections: Seq[Injection] = Seq(
    (new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))),
    (new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))),
    (new FunctionIdentifier("graft_bigram_counts"),
      new ExpressionInfo(classOf[BigramCounts].getName, "graft_bigram_counts"),
      (exprs: Seq[Expression]) => BigramCounts(exprs(0))),
    (new FunctionIdentifier("graft_md5_minhash"),
      new ExpressionInfo(classOf[Md5MinHash].getName, "graft_md5_minhash"),
      // nHashes must be a foldable int literal
      (exprs: Seq[Expression]) => Md5MinHash(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue())),
    (new FunctionIdentifier("graft_md5_bucket_score"),
      new ExpressionInfo(classOf[Md5BucketScore].getName, "graft_md5_bucket_score"),
      (exprs: Seq[Expression]) => Md5BucketScore(exprs(0))),
    (new FunctionIdentifier("graft_xx_minhash_bands"),
      new ExpressionInfo(classOf[XxMinHashBands].getName, "graft_xx_minhash_bands"),
      // numHashes, bands, shingleSize must be foldable int literals
      (exprs: Seq[Expression]) => XxMinHashBands(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].intValue())),
    (new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
      (exprs: Seq[Expression]) => Shingles(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue())),
    (new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs(0))),
    (new FunctionIdentifier("graft_token_grams"),
      new ExpressionInfo(classOf[TokenGramHashes].getName, "graft_token_grams"),
      // k must be a foldable int literal
      (exprs: Seq[Expression]) => TokenGramHashes(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue())),
    (new FunctionIdentifier("graft_winnow_fps"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow_fps"),
      // k and w must be foldable int literals
      (exprs: Seq[Expression]) => WinnowFingerprints(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()))
  )

  /** Idempotent registration on a live session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    injections.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}

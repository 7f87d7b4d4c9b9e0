package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.RollingHash

/** SparkSessionExtensions entry point — makes graft's native expressions
  * available to plain SQL sessions:
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  *   spark.sql("SELECT rolling_hash(text) FROM docs")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.rollingHashDescriptor)
    ext.injectFunction(GraftExtensions.cmsEstimateDescriptor)
    ext.injectFunction(GraftExtensions.ngramHashesDescriptor)
    ext.injectFunction(GraftExtensions.minhashSigDescriptor)
    ext.injectFunction(GraftExtensions.bottomKDescriptor)
    ext.injectFunction(GraftExtensions.simhash64Descriptor)
    ext.injectFunction(GraftExtensions.pow10fDescriptor)
    ext.injectFunction(GraftExtensions.dotProductDescriptor)
    ext.injectFunction(GraftExtensions.hyperplaneBucketsDescriptor)
    ext.injectFunction(GraftExtensions.zorderKeyDescriptor)
    ext.injectFunction(GraftExtensions.winnowKeysDescriptor)
    ext.injectFunction(GraftExtensions.cdcBoundariesDescriptor)
    ext.injectFunction(GraftExtensions.dotCodesDescriptor)
    ext.injectFunction(GraftExtensions.signedProjectDescriptor)
    ext.injectFunction(GraftExtensions.signBitsDescriptor)
    ext.injectFunction(GraftExtensions.hammingWordsDescriptor)
    ext.injectFunction(GraftExtensions.fwhtRotateDescriptor)
    ext.injectFunction(GraftExtensions.arraySumAggDescriptor)
    ext.injectFunction(GraftExtensions.poolSumDescriptor)
    // declarative dot-product folds → native codegen'd kernel
    ext.injectOptimizerRule(_ => graft.rules.RewriteDotProduct)
    // whole-operator extension: native as-of join (plans.AsOfJoinPlan →
    // AsOfJoinExec). AsOfNative.asOf also self-registers this per session
    // via spark.experimental, so the operator works without the extension.
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  val rollingHashDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
    (children: Seq[Expression]) => RollingHash(children.head))

  val cmsEstimateDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("cms_estimate"),
    new ExpressionInfo(classOf[graft.functions.CmsEstimate].getName,
      "cms_estimate"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"cms_estimate(sketch, key) takes 2 arguments, got ${children.length}")
      graft.functions.CmsEstimate(children(0), children(1))
    })

  private def litInt(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: size argument must be an INT literal, got $other")
  }

  val ngramHashesDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("ngram_hashes"),
    new ExpressionInfo(classOf[graft.functions.NgramHash].getName,
      "ngram_hashes"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"ngram_hashes(tokens, n) takes 2 arguments, got ${children.length}")
      graft.functions.NgramHash(children(0), litInt(children(1), "ngram_hashes"))
    })

  val bottomKDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("bottomk_by_hash"),
    new ExpressionInfo(classOf[graft.functions.BottomKByHash].getName,
      "bottomk_by_hash"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        s"bottomk_by_hash(value, k, salt) takes 3 arguments, got ${children.length}")
      val salt = children(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(s, _)
            if s != null => s.toString
        case other => throw new IllegalArgumentException(
          s"bottomk_by_hash: salt must be a string literal, got $other")
      }
      graft.functions.BottomKByHash(children(0),
        litInt(children(1), "bottomk_by_hash"), salt)
        .toAggregateExpression()
    })

  val arraySumAggDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("array_sum_agg"),
    new ExpressionInfo(classOf[graft.functions.ArraySumAgg].getName,
      "array_sum_agg"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"array_sum_agg(arr) takes 1 argument, got ${children.length}")
      graft.functions.ArraySumAgg(children.head).toAggregateExpression()
    })

  val poolSumDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("pool_sum"),
    new ExpressionInfo(classOf[graft.functions.PoolSumAgg].getName,
      "pool_sum"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"pool_sum(embedding, dims) takes 2 arguments, got ${children.length}")
      graft.functions.PoolSumAgg(children.head,
        litInt(children(1), "pool_sum")).toAggregateExpression()
    })

  val minhashSigDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[graft.functions.MinHashSig].getName,
      "minhash_sig"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"minhash_sig(gram_ids, k) takes 2 arguments, got ${children.length}")
      graft.functions.MinHashSig(children(0), litInt(children(1), "minhash_sig"))
    })

  val signedProjectDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("signed_project"),
    new ExpressionInfo(classOf[graft.functions.SignedProjectExpr].getName,
      "signed_project"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        s"signed_project(emb, dim_in, dim_out) takes 3 arguments, " +
          s"got ${children.length}")
      graft.functions.SignedProjectExpr(children(0),
        litInt(children(1), "signed_project"),
        litInt(children(2), "signed_project"))
    })

  val signBitsDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("sign_bits"),
    new ExpressionInfo(classOf[graft.functions.SignBitsExpr].getName,
      "sign_bits"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"sign_bits(emb, dim) takes 2 arguments, got ${children.length}")
      graft.functions.SignBitsExpr(children(0),
        litInt(children(1), "sign_bits"))
    })

  val hammingWordsDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("hamming_words"),
    new ExpressionInfo(classOf[graft.functions.HammingWordsExpr].getName,
      "hamming_words"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"hamming_words(a, b) takes 2 arguments, got ${children.length}")
      graft.functions.HammingWordsExpr(children(0), children(1))
    })

  val fwhtRotateDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("fwht_rotate"),
    new ExpressionInfo(classOf[graft.functions.FwhtRotateExpr].getName,
      "fwht_rotate"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"fwht_rotate(emb, dim) takes 2 arguments, got ${children.length}")
      graft.functions.FwhtRotateExpr(children(0),
        litInt(children(1), "fwht_rotate"))
    })

  val simhash64Descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[graft.functions.SimHash64].getName,
      "simhash64"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"simhash64(gram_ids) takes 1 argument, got ${children.length}")
      graft.functions.SimHash64(children.head)
    })

  val winnowKeysDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("winnow_keys"),
    new ExpressionInfo(classOf[graft.functions.WinnowKeys].getName,
      "winnow_keys"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        s"winnow_keys(normalized_text, k, w) takes 3 arguments, " +
          s"got ${children.length}")
      graft.functions.WinnowKeys(children.head,
        litInt(children(1), "winnow_keys"), litInt(children(2), "winnow_keys"))
    })

  val cdcBoundariesDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("cdc_boundaries"),
    new ExpressionInfo(classOf[graft.functions.CdcBoundaries].getName,
      "cdc_boundaries"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        s"cdc_boundaries(tokens, w, modulus) takes 3 arguments, " +
          s"got ${children.length}")
      graft.functions.CdcBoundaries(children.head,
        litInt(children(1), "cdc_boundaries"),
        litInt(children(2), "cdc_boundaries"))
    })

  val dotCodesDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_codes"),
    new ExpressionInfo(classOf[graft.functions.DotCodes].getName,
      "dot_codes"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"dot_codes(a, b) takes 2 arguments, got ${children.length}")
      graft.functions.DotCodes(children(0), children(1))
    })

  val pow10fDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("pow10f"),
    new ExpressionInfo(classOf[graft.functions.Pow10F].getName, "pow10f"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"pow10f(exponent) takes 1 argument, got ${children.length}")
      graft.functions.Pow10F(children.head)
    })

  val dotProductDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[graft.functions.DotProduct].getName,
      "dot_product"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"dot_product(a, b) takes 2 arguments, got ${children.length}")
      graft.functions.DotProduct(children(0), children(1))
    })

  val hyperplaneBucketsDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("hyperplane_buckets"),
    new ExpressionInfo(classOf[graft.functions.HyperplaneBucketsExpr].getName,
      "hyperplane_buckets"),
    (children: Seq[Expression]) => {
      require(children.length == 4,
        "hyperplane_buckets(emb, dim, num_planes, num_tables) takes 4 " +
          s"arguments, got ${children.length}")
      graft.functions.HyperplaneBucketsExpr(children(0),
        litInt(children(1), "hyperplane_buckets"),
        litInt(children(2), "hyperplane_buckets"),
        litInt(children(3), "hyperplane_buckets"))
    })

  // zorder_key builds the same shift/mask tree the DataFrame API composes,
  // as plain Catalyst nodes (a registry builder must return a resolvable
  // Expression — a composed Column's ColumnNode wrapper never converts on
  // this path)
  val zorderKeyDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("zorder_key"),
    new ExpressionInfo(graft.functions.ZOrder.getClass.getName, "zorder_key"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"zorder_key(x, y) takes 2 arguments, got ${children.length}")
      graft.functions.ZOrder.zorderKeyExpr(children(0), children(1))
    })
}

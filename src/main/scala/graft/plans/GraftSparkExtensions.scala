package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Session extension wiring the engine's native expressions into the
  * FunctionRegistry, so they're callable from SQL text:
  *
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftSparkExtensions
  *   spark.sql("SELECT nfkc(text) FROM docs")
  *
  * For an already-built session, use [[GraftFunctions.register]].
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("nfkc"), NfkcNormalize.info, NfkcNormalize.builder))
    ext.injectFunction(
      (FunctionIdentifier("cosine_sim"), CosineSimilarity.info, CosineSimilarity.builder))
    ext.injectFunction(
      (FunctionIdentifier("wordlist_hits"), WordlistHits.info, WordlistHits.builder))
    ext.injectFunction(
      (FunctionIdentifier("winnow_sels"), WinnowSelect.info, WinnowSelect.builder))
    ext.injectFunction(
      (FunctionIdentifier("cdc_chunks"), CdcChunks.info, CdcChunks.builder))
    ext.injectFunction(
      (FunctionIdentifier("tokenize_text"), TokenizeText.info, TokenizeText.builder))
    ext.injectFunction(
      (FunctionIdentifier("ngram_rep_stats"), NgramRepStats.info, NgramRepStats.builder))
    ext.injectFunction(
      (FunctionIdentifier("deflate_len"), DeflateLength.info, DeflateLength.builder))
    ext.injectFunction(
      (FunctionIdentifier("deflate_stored_len"),
        DeflateStoredLength.info, DeflateStoredLength.builder))
    ext.injectFunction(
      (FunctionIdentifier("phrase_hits"), PhraseHits.info, PhraseHits.builder))
    ext.injectFunction(
      (FunctionIdentifier("l2sq"), L2SqDistance.info, L2SqDistance.builder))
    ext.injectFunction(
      (FunctionIdentifier("hilbert_key"), HilbertKey.info, HilbertKey.builder))
    ext.injectFunction(
      (FunctionIdentifier("email_hits"), EmailCount.info, EmailCount.builder))
    ext.injectFunction(
      (FunctionIdentifier("email_mask"), EmailMask.info, EmailMask.builder))
    ext.injectFunction(
      (FunctionIdentifier("pii_counts"), PiiCounts.info, PiiCounts.builder))
    ext.injectFunction(
      (FunctionIdentifier("pii_mask"), PiiMaskChain.info, PiiMaskChain.builder))
    ext.injectFunction(
      (FunctionIdentifier("pii_mask_ext"),
        PiiMaskChainExt.info, PiiMaskChainExt.builder))
    ext.injectFunction(
      (FunctionIdentifier("pii_scan"), PiiScanFused.info, PiiScanFused.builder))
    ext.injectFunction(
      (FunctionIdentifier("phone_simple_hits"),
        PhoneSimpleCount.info, PhoneSimpleCount.builder))
    ext.injectFunction(
      (FunctionIdentifier("dhash_sig"), DHashSig.info, DHashSig.builder))
    ext.injectFunction(
      (FunctionIdentifier("audio_sig"), AudioSig.info, AudioSig.builder))
    ext.injectFunction(
      (FunctionIdentifier("markdown_strip"),
        MarkdownStrip.info, MarkdownStrip.builder))
    ext.injectFunction(
      (FunctionIdentifier("anchor_text_len"),
        AnchorTextLen.info, AnchorTextLen.builder))
    ext.injectFunction(
      (FunctionIdentifier("token_dist_stats"),
        TokenDistStats.info, TokenDistStats.builder))
    ext.injectFunction(
      (FunctionIdentifier("char_class_stats"),
        CharClassStats.info, CharClassStats.builder))
    ext.injectFunction(
      (FunctionIdentifier("token_set_stats"),
        TokenSetStats.info, TokenSetStats.builder))
    ext.injectFunction(
      (FunctionIdentifier("token_text_stats"),
        TokenTextStats.info, TokenTextStats.builder))
    ext.injectFunction(
      (FunctionIdentifier("text_profile_stats"),
        TextProfileStats.info, TextProfileStats.builder))
    ext.injectFunction(
      (FunctionIdentifier("collapse_repeats"),
        CollapseRepeats.info, CollapseRepeats.builder))
    ext.injectFunction(
      (FunctionIdentifier("strip_tags"), StripTags.info, StripTags.builder))
    ext.injectFunction(
      (FunctionIdentifier("dot_product"), DotProduct.info, DotProduct.builder))
    ext.injectFunction(
      (FunctionIdentifier("fix_mojibake"), FixMojibake.info, FixMojibake.builder))
    ext.injectFunction(
      (FunctionIdentifier("simhash64"), Simhash64.info, Simhash64.builder))
    ext.injectOptimizerRule(_ => CollapseNfkc)
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
  }
}

/** Imperative registration for sessions built without the extension. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("nfkc"), NfkcNormalize.info, NfkcNormalize.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cosine_sim"), CosineSimilarity.info, CosineSimilarity.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("wordlist_hits"), WordlistHits.info, WordlistHits.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("winnow_sels"), WinnowSelect.info, WinnowSelect.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cdc_chunks"), CdcChunks.info, CdcChunks.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("tokenize_text"), TokenizeText.info, TokenizeText.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("ngram_rep_stats"), NgramRepStats.info, NgramRepStats.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("deflate_len"), DeflateLength.info, DeflateLength.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("deflate_stored_len"),
      DeflateStoredLength.info, DeflateStoredLength.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("phrase_hits"), PhraseHits.info, PhraseHits.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("l2sq"), L2SqDistance.info, L2SqDistance.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("hilbert_key"), HilbertKey.info, HilbertKey.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("email_hits"), EmailCount.info, EmailCount.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("email_mask"), EmailMask.info, EmailMask.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("pii_counts"), PiiCounts.info, PiiCounts.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("pii_mask"), PiiMaskChain.info, PiiMaskChain.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("pii_mask_ext"),
      PiiMaskChainExt.info, PiiMaskChainExt.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("phone_simple_hits"),
      PhoneSimpleCount.info, PhoneSimpleCount.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dhash_sig"), DHashSig.info, DHashSig.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("audio_sig"), AudioSig.info, AudioSig.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("markdown_strip"),
      MarkdownStrip.info, MarkdownStrip.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("anchor_text_len"),
      AnchorTextLen.info, AnchorTextLen.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("token_dist_stats"),
      TokenDistStats.info, TokenDistStats.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("token_text_stats"),
      TokenTextStats.info, TokenTextStats.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("text_profile_stats"),
      TextProfileStats.info, TextProfileStats.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("collapse_repeats"),
      CollapseRepeats.info, CollapseRepeats.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("strip_tags"), StripTags.info, StripTags.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_product"), DotProduct.info, DotProduct.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("fix_mojibake"), FixMojibake.info, FixMojibake.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("simhash64"), Simhash64.info, Simhash64.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("md5_prefix_long"),
      Md5PrefixLong.info, Md5PrefixLong.builder)
    if (!spark.experimental.extraOptimizations.contains(CollapseNfkc))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CollapseNfkc
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
  }
}

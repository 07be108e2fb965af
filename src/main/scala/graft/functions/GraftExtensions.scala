package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Canonical plug-in point: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`) injects
  * every custom expression into a session at build time — the way a user
  * of this library adopts it on an existing cluster without calling
  * [[GraftFunctions.register]] per session. The same registrations back
  * both paths.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    val base: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
      ("json_extract_mysql", "MySQL-semantics JSON path extraction (wildcard wrap, case-insensitive keys)",
        exprs => JsonExtractMysql(exprs(0), exprs(1))),
      ("json_unquote", "MySQL json_unquote: unwraps a JSON string scalar to TEXT",
        exprs => JsonUnquote(exprs.head)),
      ("rolling_hash64", "64-bit polynomial rolling hash of a string's UTF-8 bytes",
        exprs => RollingHash64(exprs.head)),
      ("simhash60", "60-bit SimHash over an array of token hashes",
        exprs => SimHash60(exprs.head)),
      ("minhash64", "64-lane MinHash minima over an array of element hashes",
        exprs => MinHash64(exprs.head)),
      ("hyperplane_sig", "random-hyperplane LSH signature of a vector against a plane matrix",
        exprs => HyperplaneSig(exprs(0), exprs(1))),
      ("jaccard_sorted", "exact Jaccard of two sorted distinct string arrays (merge walk)",
        exprs => JaccardSorted(exprs(0), exprs(1))),
      ("containment_stats", "[|a∩b|/|a|, |a∩b|/|b|] of two sorted distinct string arrays (merge walk)",
        exprs => ContainmentStats(exprs(0), exprs(1))),
      ("containment_stats64", "containment_stats over sorted distinct bigint arrays (hashed prefilter phase)",
        exprs => ContainmentStats64(exprs(0), exprs(1))),
      ("dot_product", "dot product of two double arrays, index-order fold from 0.0",
        exprs => DotProduct(exprs(0), exprs(1))),
      ("argmax_dot", "index of the matrix row with the max dot product against a vector (ties -> lowest)",
        exprs => ArgmaxDot(exprs(0), exprs(1))),
      ("zorder64", "64-bit Morton interleave of two keys' low 32 bits (multi-dim layout clustering)",
        exprs => ZOrder64(exprs(0), exprs(1))),
      ("quant_stats", "[scale, max_err, mse] of symmetric int8 quantization of a float/double vector",
        exprs => QuantStats(exprs.head)),
      ("rep_stats", "[n_tokens, n_3grams, n_distinct_3grams, top_token_count] of a token array",
        exprs => RepStats(exprs.head)),
      ("text_stats", "[n_tokens, n_stopwords, n_words, n_distinct_words] of a raw document string",
        exprs => TextStats(exprs.head)),
      ("winnow_anchors", "62-bit fingerprints of a string's distinct winnowed anchor positions (fingerprints may repeat; args: text, k, w)",
        exprs => WinnowAnchors.build(exprs)),
      ("rproj_i64", "integer-exact JL random projection of a double vector through a ±1 sign matrix",
        exprs => RProjI64(exprs(0), exprs(1))),
      ("dot_i64", "exact dot product of two bigint arrays",
        exprs => DotI64(exprs(0), exprs(1))),
      ("word_ngrams", "word n-grams of a single-space-tokenized string (one codegen pass; args: text, n)",
        exprs => WordNgrams.build(exprs)),
      ("word_ngram_tfs", "distinct word n-grams with in-document counts, array<struct<token,tf>> (one codegen pass; args: text, n)",
        exprs => WordNgramTfs.build(exprs)),
      ("pq_encode", "packed PQ code word of a fixed-point vector vs per-subspace codebooks (argmin d2*16+j per subspace)",
        exprs => PqEncode.build(exprs)),
      ("pq_adc", "asymmetric-distance score of a packed PQ code word against a query LUT",
        exprs => PqAdc.build(exprs)))
    val fns = base ++ GraftFunctions.referenceNames.map { case (name, builder) =>
      (name, s"reference registry name $name (cast/predicate semantics)", builder)
    }
    fns.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
  }
}

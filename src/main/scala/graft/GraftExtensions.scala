package graft

import graft.functions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftshim.FunctionRegistration

/** SQL-surface registration of graft's custom Catalyst expressions, so
  * `spark.sql("SELECT simhash64(shingle_hashes(text, 1)) ...")` works
  * alongside the Column API.
  *
  * Two entry points:
  *  - `new GraftExtensions` with
  *    `SparkSession.builder().withExtensions(...)` (or
  *    `spark.sql.extensions=graft.GraftExtensions`) for new sessions;
  *  - `GraftExtensions.register(spark)` for an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.JaccardPrefilterRule)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }

  private def boolArg(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }

  /** name → builder for every graft expression. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "shingle_hashes" -> { args =>
      ShingleHashes(args.head, intArg(args(1), "k"),
        distinct = args.lengthCompare(2) <= 0 ||
          boolArg(args(2), "distinct"))
    },
    "minhash_signature" -> { args =>
      MinHashSignature(args.head,
        if (args.length > 1) intArg(args(1), "numHashes") else 128,
        if (args.length > 2) longArg(args(2), "seed") else 42L)
    },
    "minhash_band_buckets" -> { args =>
      MinHashBandBuckets(args.head, intArg(args(1), "bands"),
        intArg(args(2), "rows"),
        if (args.length > 3) longArg(args(3), "seed") else 42L)
    },
    "md5_shingle_keys" -> (args =>
      Md5ShingleKeys(args.head, intArg(args(1), "k"))),
    "md5_shingle_keys_all" -> (args =>
      Md5ShingleKeysAll(args.head, intArg(args(1), "k"))),
    "simhash64" -> (args => SimHash64(args.head)),
    "hyperplane_buckets" -> { args =>
      HyperplaneBuckets(args.head, intArg(args(1), "planes"),
        intArg(args(2), "tables"),
        if (args.length > 3) longArg(args(3), "seed") else 42L,
        if (args.length > 4) intArg(args(4), "dims") else 64)
    },
    "array_dot" -> (args => ArrayDot(args.head, args(1))),
    "jaccard_sim" -> (args => JaccardSim(args.head, args(1))),
    "int8_quantize" -> (args => Int8Quantize(args.head)),
    "int_array_dot" -> (args => IntArrayDot(args.head, args(1))),
    "repetition_stats" -> (args => RepetitionStats(args.head)),
    "bottom_k" -> (args => BottomK(args.head, intArg(args(1), "k"))),
    "z_value" -> (args =>
      ZValue(args.head, args(1), intArg(args(2), "bits"))),
    "cms_sketch" -> { args =>
      CmsSketch(args.head, intArg(args(1), "depth"),
        intArg(args(2), "width"))
    },
    "unicode_normalize" -> { args =>
      UnicodeNormalize(args.head, args(1) match {
        case Literal(v, _) if v != null => v.toString
        case other => throw new IllegalArgumentException(
          s"form must be a string literal, got $other")
      })
    },
    "hashed_bag_buckets" -> { args =>
      HashedBagBuckets(args.head, intArg(args(1), "buckets"),
        if (args.length > 2) args(2) match {
          case Literal(v, _) if v != null => v.toString
          case other => throw new IllegalArgumentException(
            s"salt must be a string literal, got $other")
        } else "qc:")
    },
    "bpe_encode" -> { args =>
      // merge list as one string literal: pairs comma-separated,
      // symbols space-separated — "a b,ab c" = [(a,b), (ab,c)]
      val spec = args(1) match {
        case Literal(v, _) if v != null => v.toString
        case other => throw new IllegalArgumentException(
          s"merges must be a string literal ('l r,l r,...'), got $other")
      }
      val merges =
        if (spec.isEmpty) Seq.empty[(String, String)]
        else spec.split(",").toSeq.map { p =>
          p.split(" ", 2) match {
            case Array(l, r) => (l, r)
            case _ => throw new IllegalArgumentException(
              s"bad merge pair '$p' (want 'left right')")
          }
        }
      BpeEncode(args.head, merges)
    },
    "span_dedup_stats" -> (args =>
      SpanDedupStats(args.head, intArg(args(1), "k"))),
    "strip_html" -> (args => StripHtml(args.head)),
    "jaro_winkler" -> (args => JaroWinkler(args.head, args(1))),
    "span_rebuild" -> (args =>
      SpanRebuild(args.head, args(1), intArg(args(2), "k"))))

  /** Register into an existing session (temp functions + the jaccard
    * prefilter optimizer rule via the experimental hook). */
  def register(spark: SparkSession): Unit = {
    FunctionRegistration.registerTemp(spark, builders)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.JaccardPrefilterRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.JaccardPrefilterRule
  }
}

package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{CreateArray, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}

/** SQL surface for graft's native Catalyst expressions.
  *
  * Two entry points:
  *  - config-driven (the standard Spark-native-library path):
  *    `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    installs the functions in every new session;
  *  - `GraftExtensions.register(spark)` adds them to an existing
  *    session (temp functions).
  *
  * After either, `spark.sql("SELECT graft_cosine(a.e, b.e) ...")` uses
  * the same codegen'd kernels as the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}

object GraftExtensions {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def litStrings(e: Expression, fn: String, arg: String): Seq[String] =
    e match {
      case CreateArray(items, _) => items.map {
        case Literal(s, StringType) if s != null => s.toString
        case other => throw new IllegalArgumentException(
          s"$fn: $arg must be an array of string literals, got $other")
      }
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an array of string literals, got $other")
    }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(s"$fn expects $n arguments, got ${args.length}")

  /** name → builder for every exposed function. */
  val all: Seq[(String, FunctionBuilder)] = Seq(
    "graft_cosine" -> { args =>
      arity("graft_cosine", args, 2); CosineSimilarity(args(0), args(1))
    },
    "graft_dot" -> { args =>
      arity("graft_dot", args, 2); DotProduct(args(0), args(1))
    },
    "graft_word_ngrams" -> { args =>
      arity("graft_word_ngrams", args, 2)
      WordNgramsExpr(args(0), litInt(args(1), "graft_word_ngrams", "n"))
    },
    "graft_hashed_shingles" -> { args =>
      arity("graft_hashed_shingles", args, 2)
      HashedShinglesExpr(args(0), litInt(args(1), "graft_hashed_shingles", "k"))
    },
    "graft_jaccard_sorted" -> { args =>
      arity("graft_jaccard_sorted", args, 2)
      SortedLongJaccard(args(0), args(1))
    },
    "graft_containment_sorted" -> { args =>
      arity("graft_containment_sorted", args, 2)
      SortedLongContainment(args(0), args(1))
    },
    "graft_char_entropy" -> { args =>
      arity("graft_char_entropy", args, 1)
      CharEntropyExpr(args(0))
    },
    "graft_winnow" -> { args =>
      arity("graft_winnow", args, 3)
      WinnowFingerprintExpr(args(0),
        litInt(args(1), "graft_winnow", "k"), litInt(args(2), "graft_winnow", "w"))
    },
    "graft_simhash" -> { args =>
      arity("graft_simhash", args, 1); SimHash64Expr(args(0))
    },
    // minhash signature straight from text: shingle-hash then the
    // one-pass signature kernel, both codegen'd
    "graft_minhash" -> { args =>
      arity("graft_minhash", args, 3)
      MinHashSigExpr(
        HashedShinglesExpr(args(0), litInt(args(1), "graft_minhash", "k")),
        litInt(args(2), "graft_minhash", "numPerm"))
    },
    "graft_token_set_count" -> { args =>
      arity("graft_token_set_count", args, 2)
      TokenSetCountExpr(args(0),
        litStrings(args(1), "graft_token_set_count", "tokens"))
    },
    // Portable (md5-family) twins — every value replayable in external
    // SQL engines (see DedupPortable/PortableKernels); same kernels the
    // oracle-checked q51/q52/q57 run.
    "graft_md5_shingles" -> { args =>
      arity("graft_md5_shingles", args, 2)
      Md5ShinglesExpr(args(0), litInt(args(1), "graft_md5_shingles", "k"))
    },
    "graft_simhash_md5" -> { args =>
      arity("graft_simhash_md5", args, 1); SimHashMd5Expr(args(0))
    },
    "graft_minhash_md5" -> { args =>
      arity("graft_minhash_md5", args, 3)
      MinHashAffineSigExpr(
        Md5ShinglesExpr(args(0), litInt(args(1), "graft_minhash_md5", "k")),
        litInt(args(2), "graft_minhash_md5", "numPerm"))
    },
    "graft_winnow_md5" -> { args =>
      arity("graft_winnow_md5", args, 3)
      WinnowMd5Expr(args(0),
        litInt(args(1), "graft_winnow_md5", "k"),
        litInt(args(2), "graft_winnow_md5", "w"))
    },
    "graft_quantize_dequantize" -> { args =>
      arity("graft_quantize_dequantize", args, 1)
      QuantizeDequantizeExpr(args(0))
    },
    // composed from built-in catalyst expressions (not a custom
    // Expression) — registry builders need resolved trees, so this is
    // assembled directly rather than via the Column API
    "graft_normalize" -> { args =>
      arity("graft_normalize", args, 1)
      import org.apache.spark.sql.catalyst.expressions.{Lower, RegExpReplace, StringTrim}
      StringTrim(RegExpReplace(
        RegExpReplace(Lower(args(0)), Literal("[^a-z0-9 ]"), Literal("")),
        Literal(" +"), Literal(" ")))
    },
    // Z-order (Morton) curve of two 16-bit coordinates — the layout key
    // Ops.zorderWrite clusters on, exposed to pure-SQL users. Composed
    // builtin bitwise expressions (same magic-mask cascade as
    // Ops.zorder2 — GraftExtensionsSpec pins the two to equal output),
    // so it rides whole-stage codegen.
    "graft_zorder" -> { args =>
      arity("graft_zorder", args, 2)
      import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, Expression, ShiftLeft}
      import org.apache.spark.sql.types.LongType
      def spread(e: Expression): Expression = {
        val a = BitwiseAnd(Cast(e, LongType), Literal(0xFFFFL))
        val b = BitwiseAnd(BitwiseOr(a, ShiftLeft(a, Literal(8))), Literal(0x00FF00FFL))
        val c = BitwiseAnd(BitwiseOr(b, ShiftLeft(b, Literal(4))), Literal(0x0F0F0F0FL))
        val d = BitwiseAnd(BitwiseOr(c, ShiftLeft(c, Literal(2))), Literal(0x33333333L))
        BitwiseAnd(BitwiseOr(d, ShiftLeft(d, Literal(1))), Literal(0x55555555L))
      }
      BitwiseOr(spread(args(0)), ShiftLeft(spread(args(1)), Literal(1)))
    },
    // Record-linkage kernels (r7): scan-speed Jaro-Winkler (bit-pinned
    // to the classic definition, = DuckDB's jaro_winkler_similarity)
    // and UAX #15 NFC canonicalization, for pure-SQL users.
    "graft_jaro_winkler" -> { args =>
      arity("graft_jaro_winkler", args, 2)
      JaroWinklerExpr(args(0), args(1))
    },
    "graft_nfc" -> { args =>
      arity("graft_nfc", args, 1)
      NfcNormalizeExpr(args(0))
    },
    // Chain-exact unreserved percent-decode (r14): urlNormalize's hot
    // front door exposed to pure-SQL users.
    "graft_url_pctdecode" -> { args =>
      arity("graft_url_pctdecode", args, 1)
      PercentDecodeUnreservedExpr(args(0))
    })

  /** Install on an EXISTING session as temp functions. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      org.apache.spark.sql.graft.ColumnBridge
        .registerTempFunction(spark, name, builder)
    }
}

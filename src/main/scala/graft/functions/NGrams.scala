package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native table-generating function (UDTF surface, SURVEY §2.10):
  * `graft_ngrams(text, n)` emits one row per word n-gram of a
  * space-tokenized string — `LATERAL VIEW graft_ngrams(text, 3)` in SQL,
  * `explode`-style in DataFrame code.
  *
  * vs the `TextHashes.shinglesAll` kernel + `explode`: the kernel
  * materializes the FULL n-gram array per document before the generator
  * unnests it — at 100 TB that is an O(doc_len) allocation per row living
  * across two operators. A native [[Generator]] streams each n-gram row
  * straight into the downstream consumer (Spark's GenerateExec iterates
  * the returned rows lazily), no intermediate array, and registers through
  * the same public function surface as the scalar/aggregate extensions.
  * CodegenFallback is deliberate: GenerateExec drives generators through
  * eval; the per-call work (one slice + concat) dwarfs interpretation
  * overhead, unlike the per-element scalar hot loops FloatDot codegens.
  *
  * Determinism: pure string arithmetic on the input order of tokens.
  * Null or too-short inputs emit no rows (inner-join semantics, like
  * `explode`; use OUTER in SQL for padding semantics).
  */
case class NGrams(child: Expression, nExpr: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, nExpr)
  private lazy val n: Int = nExpr.eval().asInstanceOf[Number].intValue()

  override def elementSchema: StructType =
    StructType(Seq(StructField("ngram", StringType, nullable = false)))
  override def prettyName: String = "graft_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, nExpr.dataType) match {
      case (StringType, IntegerType) =>
        if (!nExpr.foldable)
          TypeCheckResult.TypeCheckFailure("graft_ngrams: n must be a literal")
        else if (nExpr.eval() == null || nExpr.eval().asInstanceOf[Number].intValue() <= 0)
          TypeCheckResult.TypeCheckFailure("graft_ngrams: n must be > 0")
        else TypeCheckResult.TypeCheckSuccess
      case (c, k) => TypeCheckResult.TypeCheckFailure(
        s"graft_ngrams requires (string, int) arguments, got ($c, $k)")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input)
    if (s == null) Iterator.empty
    else {
      val toks = s.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (toks.length < n) Iterator.empty
      else (0 to toks.length - n).iterator.map { i =>
        InternalRow(UTF8String.fromString(toks.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NGrams =
    copy(child = newChildren(0), nExpr = newChildren(1))
}

object NGrams {
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "graft_ngrams takes exactly 2 arguments")
    NGrams(exprs.head, exprs(1))
  }

  /** Register `graft_ngrams` in the session's function registry. Idempotent;
    * [[graft.GraftExtensions]] is the declarative equivalent. */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngrams", builder, "built-in")
}

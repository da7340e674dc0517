package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Payment-card detection + Luhn validation + redaction as ONE kernel —
  * the single-pass replacement for [[graft.ext.Corpus]]'s column chain
  * (`regexp_extract_all` candidates → higher-order `filter` with an
  * `aggregate`-over-`sequence` Luhn fold per candidate → `aggregate`
  * replace fold). The collection HOFs have no `doGenCode`, so ANY
  * projection containing the chain falls back to interpreted
  * evaluation (the DESIGN §14/16 codegen ceiling) — and
  * `Curate.Config.redactOutputPii` runs this as the FINAL rewrite of
  * every curated survivor's full text, a 100 TB corpus pass at design
  * scale.
  *
  * BIT-EXACT to the chain, piece by piece:
  *
  *  - Candidates: the SAME `java.util.regex` pattern object semantics
  *    Spark's `regexp_extract_all` compiles
  *    (`\b[0-9](?:[ -]?[0-9]){12,18}\b`, flags 0) driven by the same
  *    `while (m.find())` non-overlapping leftmost loop — including the
  *    backtracking subtleties (a 20-digit run matches 19 digits
  *    STARTING AT INDEX 1, because position 0 can never reach a
  *    trailing `\b`), which a hand-rolled scanner would have to
  *    re-derive. Match extraction is the one regex pass the chain also
  *    pays; what the kernel removes is the per-candidate interpreted
  *    HOF machinery around it.
  *  - Luhn ([[graft.ext.Corpus.luhnValidExpr]]): separators stripped,
  *    digit count required in [13, 19], double every second digit from
  *    the right, −9 above 9, valid iff sum ≡ 0 (mod 10). Integer
  *    arithmetic — order-insensitive, trivially identical.
  *  - Replacement: the chain's `aggregate(valid, text, replace(acc, c,
  *    "<CARD>"))` is a SEQUENTIAL REPLACE-ALL fold over the valid
  *    candidates in match order; the kernel replays exactly that
  *    (`String.replace` == Spark's `StringReplace` literal-replace-all
  *    semantics), including the documented over-redaction of a valid
  *    candidate's text embedded in a longer run.
  *
  * CorpusRulesSpec pins kernel == chain on adversarial digit soup
  * (separators, embedded occurrences, 20-digit backtracking runs,
  * multiple cards, astral-char neighbors, NULL/short/empty). */
object CardRedactAlgo {

  /** The chain's candidate pattern, verbatim
    * ([[graft.ext.Corpus.cardCandidatesExpr]]). */
  val CandidateRegex = "\\b[0-9](?:[ -]?[0-9]){12,18}\\b"

  private val pattern = java.util.regex.Pattern.compile(CandidateRegex)

  /** Replacement token, shared with the chain. */
  val Token = "<CARD>"

  /** Luhn mod-10 over the candidate with `[ -]` stripped; requires
    * 13-19 digits ([[graft.ext.Corpus.luhnValidExpr]] semantics). */
  def luhnValid(cand: String): Boolean = {
    var digits = 0
    var i = 0
    val n = cand.length
    while (i < n) {
      val c = cand.charAt(i)
      if (c >= '0' && c <= '9') digits += 1
      i += 1
    }
    if (digits < 13 || digits > 19) return false
    var sum = 0
    var pos = 0 // 0-based index from the RIGHT over digits only
    i = n - 1
    while (i >= 0) {
      val c = cand.charAt(i)
      if (c >= '0' && c <= '9') {
        val d = c - '0'
        if ((pos & 1) == 1) {
          val dbl = d * 2
          sum += (if (dbl > 9) dbl - 9 else dbl)
        } else sum += d
        pos += 1
      }
      i -= 1
    }
    sum % 10 == 0
  }

  /** One pass: candidates → Luhn filter → sequential replace-all fold.
    * Returns (redacted, nCandidates, nValid). */
  def redact(u: UTF8String): (String, Int, Int) = {
    val s = u.toString
    val m = pattern.matcher(s)
    var nCand = 0
    var valid: java.util.ArrayList[String] = null
    while (m.find()) {
      nCand += 1
      val cand = m.group()
      if (luhnValid(cand)) {
        if (valid == null) valid = new java.util.ArrayList[String](4)
        valid.add(cand)
      }
    }
    if (valid == null) return (s, nCand, 0)
    var r = s
    var i = 0
    while (i < valid.size()) {
      r = r.replace(valid.get(i), Token)
      i += 1
    }
    (r, nCand, valid.size())
  }

  /** [[redact]] packed for the expression: struct<redacted string,
    * n_candidates int, n_valid int>. */
  def eval(u: UTF8String): InternalRow = {
    val (r, nc, nv) = redact(u)
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(r), nc, nv))
  }

  /** [[redact]]'s text only — the `piiAndCardsRedactedExpr` hot path
    * needs no counts; skipping the row allocation keeps the generated
    * code a single static call returning UTF8String. */
  def evalText(u: UTF8String): UTF8String = {
    val (r, _, _) = redact(u)
    UTF8String.fromString(r)
  }
}

/** `card_redact(text)` → struct<redacted, n_candidates, n_valid> —
  * [[CardRedactAlgo]] as a codegen'd unary expression. NULL in → NULL
  * struct out (matching the chain: NULL text gives NULL counts and
  * NULL redacted — unknown text is unknown). */
case class CardRedact(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"card_redact expects string, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("redacted", StringType),
    StructField("n_candidates", IntegerType),
    StructField("n_valid", IntegerType)))
  override def prettyName: String = "card_redact"

  override def nullSafeEval(s: Any): Any =
    CardRedactAlgo.eval(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CardRedactAlgo.eval($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** `card_redact_text(text)` — redacted text only, for the scrub chain
  * where the counts are not materialized. */
case class CardRedactText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"card_redact_text expects string, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "card_redact_text"

  override def nullSafeEval(s: Any): Any =
    CardRedactAlgo.evalText(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CardRedactAlgo.evalText($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Expression-only HTML -> text extraction (the step between `Warc.toPages`
 * raw bytes and the curation operators — reference analog: the per-item
 * scan -> parse -> use pipeline of plot_courses.py:327-339, here applied
 * to the crawl wire format). Everything is built from codegen'd built-ins
 * (regexp_replace / replace / trim), so the whole extraction inlines into
 * the page scan's WholeStageCodegen span — no UDF, no mapPartitions, and
 * the DuckDB oracle replays the identical pattern chain (q73).
 *
 * Deliberate scope (documented, oracle-shared): lowercase well-formed
 * tags (Common Crawl HTML is normalized lowercase in the fixture; a
 * production extractor would lowercase-fold first), script/style blocks
 * dropped wholesale, the 6 ubiquitous named entities decoded, whitespace
 * collapsed. The patterns avoid every construct where Java regex and RE2
 * disagree (no backrefs, no lookaround — the q66 rule).
 */
object TextExtract {

  /** The entity set both sides decode, in the ONE order that never
    * double-decodes: `&amp;` strictly last (so "&amp;lt;" -> "&lt;",
    * not "<"). */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** script/style blocks (content dropped wholesale), then all tags. */
  private val BlockPatterns = Seq(
    "(?s)<script[^>]*>.*?</script>",
    "(?s)<style[^>]*>.*?</style>",
    "<[^>]*>")

  /** HTML string -> extracted text: tags stripped, entities decoded,
    * whitespace collapsed to single spaces, trimmed. Pure Column
    * expression over a STRING column (cast the `html` binary first). */
  def fromHtml(html: Column): Column = {
    val untagged = BlockPatterns.foldLeft(html)((c, p) => regexp_replace(c, p, " "))
    val decoded = Entities.foldLeft(untagged) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The same chain as DuckDB SQL over a body-string expression — kept
    * NEXT TO the Scala definition so the two sides can only drift in one
    * code review, not two (the shared-constants rule, applied to an
    * expression pipeline). */
  def fromHtmlSql(body: String): String = {
    val untagged = BlockPatterns.foldLeft(body)((s, p) =>
      s"regexp_replace($s, '$p', ' ', 'g')")
    val decoded = Entities.foldLeft(untagged) { case (s, (e, r)) =>
      val rq = r.replace("'", "''")
      s"replace($s, '$e', '$rq')"
    }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language ID, quality scoring,
  * token counting, document fingerprinting. Every function is a pure column
  * expression (codegen'd, pushdown-friendly) so they compose into scans
  * without extra stages.
  */
object TextAnalysis {

  /** Stopword marker lists per language for the n-gram language heuristic. */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in)\\b",
    "de" -> "\\b(der|die|das|und|ist)\\b",
    "fr" -> "\\b(le|la|les|et|est)\\b"
  )

  def langScore(textCol: Column, pattern: String): Column =
    regexp_count(lower(textCol), lit(pattern)).cast("long")

  /** Highest-scoring language (ties resolve in LangMarkers order):
    * en >= all -> en; else de >= fr -> de; else fr.
    */
  def langId(textCol: Column): Column = {
    val Seq(en, de, fr) = LangMarkers.map { case (_, p) => langScore(textCol, p) }
    when(en >= de && en >= fr, "en").when(de >= fr, "de").otherwise("fr")
  }

  def wsTokenCount(textCol: Column): Column =
    regexp_count(textCol, lit("\\S+")).cast("long")

  /** BPE-ish token estimate: alpha runs, digit runs, single punctuation. */
  def bpeishTokenCount(textCol: Column): Column =
    regexp_count(textCol, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")

  def punctCount(textCol: Column): Column =
    regexp_count(textCol, lit("[.,;:!?]")).cast("long")

  def stopwordCount(textCol: Column): Column =
    regexp_count(lower(textCol), lit("\\b(the|a|an|is|are|was|of|to)\\b")).cast("long")

  /** Normalized text: lowercase, non-alphanumerics collapsed to single spaces. */
  def normalized(textCol: Column): Column =
    trim(regexp_replace(lower(textCol), "[^a-z0-9]+", " "))

  /** Content fingerprint: md5 of the normalized text (whitespace/punct/case
    * insensitive — survives reformatting, catches boilerplate reposts).
    */
  def fingerprint(textCol: Column): Column = md5(normalized(textCol))

  /** Composite quality heuristic in [0,1]: penalizes very short docs, low
    * word length, absent stopwords and punctuation spam.
    */
  def qualityScore(textCol: Column): Column = {
    val chars = length(textCol).cast("double")
    val words = wsTokenCount(textCol).cast("double")
    val punct = punctCount(textCol).cast("double")
    val stop = stopwordCount(textCol).cast("double")
    val lengthScore = least(chars / 500.0d, lit(1.0d))
    val meanWordLen = when(words > 0, chars / words).otherwise(0.0d)
    val wordLenScore = when(meanWordLen.between(3.0d, 12.0d), 1.0d).otherwise(0.5d)
    val stopScore = when(words > 0, least(stop / (words * lit(0.05d)), lit(1.0d))).otherwise(0.0d)
    val punctPenalty = when(chars > 0 && punct / chars > 0.1d, 0.5d).otherwise(1.0d)
    round((lengthScore * 0.3d + wordLenScore * 0.2d + stopScore * 0.5d) * punctPenalty, 4)
  }

  /** One-stop enrichment: adds lang/quality/token/fingerprint columns. */
  def enrich(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("lang_pred", langId(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("ws_tokens", wsTokenCount(t))
      .withColumn("bpeish_tokens", bpeishTokenCount(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}

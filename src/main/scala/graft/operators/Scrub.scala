package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-scrubbing operators for training-data pipelines: PII redaction and
  * corpus-frequency boilerplate removal (the C4/RefinedWeb cleaning family).
  *
  * All regex patterns are RE2-safe (no lookarounds, no backreferences) so
  * any engine — Spark's Java regex, DuckDB/RE2, Hyperscan — matches the
  * same spans; that keeps the operators cross-engine verifiable.
  */
object Scrub {

  /** Email addresses (pragmatic form: local@domain.tld). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style dashed phone numbers (NNN-NNN-NNNN). */
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Dotted-quad IPv4 literals. */
  val IpPattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Occurrences of `pattern` in `text` (0 for no match). */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** C0/C1-ish control characters, EXCLUDING the whitespace controls
    * TAB/LF/CR (\x09 \x0A \x0D) which the whitespace-collapse pass owns.
    * \x0B (vertical tab) is deliberately IN this class: Java's `\s`
    * matches it but RE2's does not, so routing it through the control
    * strip — which both engines agree on — keeps [[normalizeText]]
    * cross-engine exact. */
  val ControlPattern = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Canonical text cleanup — the first stage of a crawl-ingest pipeline:
    * Unicode NFC composition (combining marks → precomposed, so dedup
    * fingerprints / shingles / vocab don't fracture on encoding variants),
    * control-character strip, whitespace-run collapse to a single space,
    * and edge trim. Entirely codegen'd expressions (the NFC step is the
    * custom [[graft.functions.NfcNormalize]] expression with an
    * allocation-free ASCII fast path), so the whole cleanup rides in the
    * scan stage's WholeStageCodegen span: no shuffle, cost linear in bytes
    * scanned — the only shape that survives 100 TB. */
  def normalizeText(text: Column): Column =
    trim(
      regexp_replace(
        regexp_replace(
          graft.functions.GraftFunctions.nfc_normalize(text),
          ControlPattern, ""),
        "\\s+", " "))

  /** Redact PII spans with typed placeholders, in a fixed order chosen so
    * earlier passes cannot manufacture later matches: emails first (their
    * local/domain parts contain digit runs a later pass could half-match),
    * then IPv4 (dotted quads), then phones (dashed). Pure codegen'd
    * `regexp_replace` chain — scan-stage work, no shuffle, no UDF.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "[EMAIL]"),
        IpPattern, "[IP]"),
      PhonePattern, "[PHONE]")

  /** URL host via the codegen'd `try_parse_url` (null for unparseable
    * input — the ANSI `parse_url` would fail the whole stage on one
    * malformed row; a crawl always has malformed rows). */
  def urlHost(url: Column): Column = try_parse_url(url, lit("HOST"))

  /** Registrable domain approximation: the last `levels` dot-labels of the
    * host (a public-suffix list is data, not code — callers with exotic
    * TLD needs substitute their own). Pure array expressions. */
  def registrableDomain(host: Column, levels: Int = 2): Column =
    array_join(slice(split(host, "\\."), -levels, levels), ".")

  /** HTML-to-text extraction — the step between a raw crawl and every
    * text operator here: `<script>`/`<style>` blocks go first (their
    * CONTENT is code, not prose — tag-only stripping would leak it into
    * the corpus), then all remaining tags become spaces (block boundaries
    * must not glue words together), then the five ubiquitous named
    * entities decode, `&amp;` LAST so `&amp;lt;` ends as the literal
    * `&lt;` the author wrote, not a re-decoded `<`.
    *
    * All patterns are RE2-safe — `(?is)` inline flags and lazy `.*?`
    * repetition are common to Java regex and RE2, and there are no
    * lookarounds/backrefs — so DuckDB replays the chain byte-identically.
    * Scan-stage codegen'd expressions only; callers finish with
    * [[normalizeText]] for whitespace/NFC canonicalization. Numeric
    * character references need an indexed-substitution loop (backrefs), so
    * they are out of expression reach by design — a corpus that needs them
    * routes through a decode lane, not this fast path. */
  def stripHtml(html: Column): Column = {
    // one pass per block NAME, the name followed by explicit whitespace
    // or '>' (NOT \b — '-' is a non-word char, so \b would still let
    // `<style-card>` open a block; RE2 has no lookahead, so the follow
    // set is spelled out, and as [ \t\r\n] rather than \s because Java's
    // \s matches \x0B while RE2's does not). Open and close tags PAIR
    // per name: `<script>...</style>` does not close a script block.
    val noBlocks = Seq("script", "style").foldLeft(html) { (c, tag) =>
      regexp_replace(c, s"(?is)<$tag([ \\t\\r\\n][^>]*)?>.*?</$tag>", " ")
    }
    // tags must LOOK like tags (</? + letter or !): a free-standing
    // comparison in prose — `profit was < 100 but growth > 5` — is not
    // swallowed as a pseudo-tag
    val noTags = regexp_replace(noBlocks, "(?s)</?[A-Za-z!][^>]*>", " ")
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
  }

  /** Terminal sentence punctuation — the C4 "looks like prose" line test:
    * navigation chrome, button labels, and code fragments rarely end in
    * one of these. The optional `\r` keeps CRLF pages honest after an
    * `\n` split AND keeps the two engines agreeing: Java's `$` matches
    * before a final line terminator while RE2's matches only at absolute
    * end, so a bare `$` against "...sentence.\r" would keep the line in
    * Spark and drop it in the oracle. */
  val TerminalPunctPattern = "[.!?\"']\\r?$"

  /** The ROW-LOCAL line rules of the C4 cleaning recipe (Raffel et al.
    * 2020 §2.2), complementing [[dropBoilerplateLines]]'s corpus-frequency
    * rule: keep only lines that end in terminal punctuation, have at least
    * `minWords` words, and do not mention javascript (the "enable
    * JavaScript" interstitial family). Pure higher-order array expressions
    * over the split page — scan-stage, zero shuffle at any corpus size,
    * and every predicate is RE2-safe so DuckDB replays it exactly. */
  def c4KeptLines(page: Column, minWords: Int = 5, sep: String = "\n"): Column =
    filter(split(page, java.util.regex.Pattern.quote(sep)), l =>
      l.rlike(TerminalPunctPattern) &&
        size(split(trim(l), " +")) >= minWords &&
        not(lower(l).contains("javascript")))

  /** C4's PAGE-level drop rules over the line survivors: any page with
    * "lorem ipsum" (placeholder text), a curly brace (leaked code), or
    * fewer than `minLines` surviving lines is removed wholesale. */
  def c4PageKeep(page: Column, keptLines: Column, minLines: Int = 3): Column =
    not(lower(page).contains("lorem ipsum")) &&
      not(page.contains("{")) &&
      (size(keptLines) >= minLines)

  /** Tracking query parameters dropped by [[canonicalizeUrl]]: the
    * click-attribution family that fractures URL-dedup keys (every social
    * share of one page gets a distinct fbclid). RE2-safe alternation. */
  val TrackingParamPattern = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)="

  /** URL canonicalization — the dedup key a crawl pipeline groups by
    * before per-host caps and exact dedup: lowercase scheme+host, strip
    * the scheme's default port (:443/:80), drop the fragment, drop
    * tracking parameters ([[TrackingParamPattern]]), sort the surviving
    * query parameters (param order is non-semantic), and trim trailing
    * path slashes (root stays `/`). Without this, trivially-distinct
    * spellings of one page each survive exact dedup and skew per-URL
    * stats.
    *
    * Entirely codegen'd string/array expressions over RE2-safe patterns
    * (the component split is three anchored `regexp_extract`s, not a
    * parser) — scan-stage only, zero shuffle, cross-engine replayable,
    * which is the contract every stage-0 cleanup op here follows.
    * Malformed rows (no `scheme://`) yield null rather than a half-canon
    * key — callers route them to a quarantine lane, mirroring
    * [[urlHost]]'s null contract. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "https", regexp_replace(hostRaw, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
      .otherwise(hostRaw)
    val pathRaw =
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val pathTrim = regexp_replace(pathRaw, "/+$", "")
    val path = when(pathTrim === "", lit("/")).otherwise(pathTrim)
    // anchor at the FIRST '?': a greedy [^#]* would skip to the LAST one,
    // silently dropping everything before it when a query VALUE itself
    // contains '?' (legal and common: redirect=/x?y=2)
    val query = regexp_extract(url, "^[^?#]*\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamPattern))
    val queryC = array_join(array_sort(params), "&")
    when(scheme === "" || hostRaw === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path,
        when(queryC =!= "", concat(lit("?"), queryC)).otherwise(lit(""))))
  }

  /** Per-host document cap — the C4/RefinedWeb anti-spam mixture control:
    * at most `k` documents per URL host, picked deterministically (md5
    * rank, [[Sampling.stratifiedFixedK]]'s bounded min-k aggregator — the
    * shuffle carries at most k rows per host per map task, so one mega-host
    * never bottlenecks a reducer). Output: host, idCol, `sample_rank`.
    */
  def capPerHost(
      df: DataFrame,
      urlCol: String,
      idCol: String,
      k: Int): DataFrame = {
    val hosts = df.select(col(idCol), urlHost(col(urlCol)).as("host"))
      .filter(col("host").isNotNull)
    Sampling.stratifiedFixedK(hosts, "host", idCol, k)
  }

  /** Drop lines that occur in more than `maxDocFreq` distinct documents —
    * corpus-frequency boilerplate removal (navigation chrome, cookie
    * banners, license footers): the line-level dedup step of the C4
    * pipeline. Documents are split on `sep` (a literal, not a regex),
    * offending lines are dropped, and the survivors are reassembled in
    * their original order. Documents whose every line is boilerplate drop
    * out entirely.
    *
    * Output: idCol, `n_kept` (surviving line count), `cleaned` (the
    * reassembled text).
    *
    * Scale shape: one narrow posexplode (no pre-shuffle), a distinct +
    * count over (line) for document frequency — map-side combinable — and
    * an anti join whose strategy is left to AQE: the hot-line relation is
    * usually small (only lines repeated across > maxDocFreq docs survive),
    * in which case AQE broadcasts it and the corpus is never shuffled until
    * the final per-document regroup — but it is bounded only by corpus
    * content (a 100 TB crawl at a low maxDocFreq can have hundreds of
    * millions of hot lines), so the broadcast is NOT forced: when the
    * relation is genuinely large AQE falls back to a shuffle join instead
    * of OOMing the driver.
    */
  def dropBoilerplateLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDocFreq: Long,
      sep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
    val hot = lines.select(col(idCol), col("line")).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("df_"))
      .filter(col("df_") > maxDocFreq)
      .select("line")
    lines.join(hot, Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")),
          sep).as("cleaned"))
  }

  /** Per-group robust outlier report over a numeric column — the
    * distribution-tail cleaning heuristic (truncated docs, concatenation
    * blobs, template spam show up as length-distribution outliers long
    * before content metrics move). Quartiles come from
    * [[Sampling.sampledQuantilesByGroup]]'s deterministic k-min-hash
    * sample (bounded state, no value-range knowledge needed), fences are
    * Tukey's q1 − f·IQR / q3 + f·IQR with the heavy-tail f = 3.0 default,
    * and the flag pass is one scan against the broadcast per-group fence
    * row. Everything downstream of the sample is exact counting, so the
    * report is bit-reproducible on any cluster.
    *
    * Output per group: (group, n_docs, n_low, n_high, q1, q3, lo, hi). */
  def outlierReport(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: Column,
      k: Int = 4096,
      fence: Double = 3.0): DataFrame = {
    require(fence > 0, "fence must be positive")
    val qs = Sampling.sampledQuantilesByGroup(df, groupCol, idCol,
      valueCol, Seq(0.25, 0.75), k)
    val wide = qs.groupBy(col(groupCol)).agg(
      min(when(col("p") === 0.25, col("q"))).as("q1"),
      min(when(col("p") === 0.75, col("q"))).as("q3"))
    val fences = wide.select(col(groupCol),
      col("q1"), col("q3"),
      (col("q1").cast("double") -
        lit(fence) * (col("q3") - col("q1")).cast("double")).as("lo"),
      (col("q3").cast("double") +
        lit(fence) * (col("q3") - col("q1")).cast("double")).as("hi"))
    df.select(col(groupCol), valueCol.as("__x"))
      .join(broadcast(fences), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        count_if(col("__x").cast("double") < col("lo")).as("n_low"),
        count_if(col("__x").cast("double") > col("hi")).as("n_high"),
        min(col("q1")).as("q1"), min(col("q3")).as("q3"),
        min(col("lo")).as("lo"), min(col("hi")).as("hi"))
  }
}

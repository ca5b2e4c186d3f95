package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spark-native re-expression of the reference's DLP de-identification
  * surface (DLPTokenizationDoFn.java:69-160 + the DLP template
  * transforms its configs name: CharacterMaskConfig, redact/replace
  * infoType transforms, CryptoHashConfig, CryptoDeterministicConfig,
  * DateShiftConfig, FixedSizeBucketingConfig; re-identification per
  * BQReidentificationPipeline.java:165-265).
  *
  * Everything is a pure `Column` function over codegen'd builtins —
  * no UDFs, no service calls: at 100 TB the transform runs inside
  * whole-stage codegen at scan speed, instead of RPC-batching rows to
  * an external service like the reference does.
  */
object Dlp {

  /** infoType detector regexes (Java regex ∩ RE2 subset so Spark and
    * DuckDB agree; DLP's EMAIL_ADDRESS / PHONE_NUMBER analogs). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val AnyPiiRe = s"$EmailRe|$PhoneRe"

  /** CharacterMaskConfig: keep the first `keep` chars, mask the rest. */
  def maskChars(c: Column, keep: Int, mask: String = "#"): Column =
    concat(substring(c, 1, keep),
      repeat(lit(mask), greatest(length(c) - keep, lit(0))))

  /** Redaction: strip every infoType match. */
  def redact(c: Column, re: String = AnyPiiRe, token: String = "[REDACTED]"): Column =
    regexp_replace(c, re, token)

  /** ReplaceWithInfoTypeConfig: substitute each match with its type tag. */
  def replaceWithInfoType(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "[EMAIL_ADDRESS]"), PhoneRe, "[PHONE_NUMBER]")

  /** Inspect: match count for one infoType (findings cardinality). */
  def inspectCount(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** Inspect: first quoted match (DLP finding `quote`). */
  def inspectQuote(c: Column, re: String): Column =
    regexp_extract(c, re, 0)

  /** CryptoHashConfig: keyed SHA-256 (irreversible pseudonym). */
  def cryptoHash(c: Column, key: String): Column =
    sha2(concat(lit(key + ":"), c), 256)

  /** CryptoDeterministicConfig: deterministic reversible-by-vault
    * surrogate token. Same plaintext ⇒ same token at any parallelism. */
  def deterministicToken(c: Column, key: String): Column =
    concat(lit("TOK_"), substring(sha2(concat(lit(key + ":"), c), 256), 1, 32))

  /** DateShiftConfig: key-deterministic shift within ±maxDays. The
    * shift is a pure function of the context key, so all records of
    * one entity shift coherently (DLP's date-shift-with-context). */
  def dateShift(ts: Column, contextKey: Column, maxDays: Int): Column = {
    val span = 2 * maxDays + 1
    val days = (contextKey % span - maxDays).cast("int")
    timestamp_add("DAY", days, ts)
  }

  /** TimePartConfig: replace a date with ONE extracted part — the DLP
    * generalization that keeps only the analytically-needed component
    * (publish birth YEAR, drop the exact date). Codegen'd date
    * functions; part names follow the DLP enum. */
  def timePart(ts: Column, part: String): Column = part match {
    case "YEAR"         => year(ts).cast("long")
    case "MONTH"        => month(ts).cast("long")
    case "DAY_OF_MONTH" => dayofmonth(ts).cast("long")
    case "WEEK_OF_YEAR" => weekofyear(ts).cast("long")
    case other => throw new IllegalArgumentException(s"unsupported time part: $other")
  }

  /** FixedSizeBucketingConfig: numeric generalization to width-sized
    * buckets labeled "lo_hi". */
  def bucketize(c: Column, width: Int): Column = {
    val lo = floor(c / width).cast("long") * width
    concat(lo.cast("string"), lit("_"), (lo + width).cast("string"))
  }

  /** Format-preserving digit substitution (the
    * CryptoReplaceFfxFpeConfig shape: output keeps the input's
    * format — digits map to digits, everything else passes through,
    * length preserved). Each digit is shifted by a key+position-
    * derived amount, so equal plaintexts tokenize equally and the
    * token still validates as a phone/account number. Pure codegen'd
    * expression (per-char higher-order transform, no UDF). */
  def fpeDigits(colName: String, key: String): Column =
    expr(
      s"""array_join(transform(sequence(1, length($colName)), i ->
         |  CASE WHEN substring($colName, i, 1) >= '0' AND substring($colName, i, 1) <= '9'
         |    THEN CAST((CAST(substring($colName, i, 1) AS INT) +
         |               ascii(substring(md5(concat('$key', ':', CAST(i AS STRING))), 1, 1))) % 10 AS STRING)
         |    ELSE substring($colName, i, 1) END), '')""".stripMargin.replace("\n", " "))
}

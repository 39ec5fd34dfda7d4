package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2 C — PII masking / hashing / type-conversion transformers
  * (reference: src/transformation/transformers/pii.py, types.py, rules.py).
  *
  * The reference masks values row-by-row in a Kafka consumer; graft
  * expresses every mask as a codegen'd Catalyst expression over a column,
  * so masking 100 TB is a narrow map with zero shuffle.
  *
  * The test lake has no PII columns, so each query first synthesizes
  * deterministic PII (email/phone/SSN/card) from `customer` keys with
  * engine-portable string ops — the DuckDB oracle rebuilds the identical
  * inputs, then both apply the identical mask.
  */
object PiiSuite {

  /** Synthesized PII columns, Spark side. Formats:
    * email `customer.000000001@example.com`, phone `(123) 456-7890`,
    * ssn `123-45-6789`, card `4532############` (16 digits).
    */
  private def withPii(df: DataFrame): DataFrame = df
    .withColumn("email", concat(lower(regexp_replace(col("c_name"), "#", ".")), lit("@example.com")))
    .withColumn("phone", concat(
      lit("("), lpad(((col("c_custkey") * 7) % 1000).cast("string"), 3, "0"),
      lit(") "), lpad(((col("c_custkey") * 13) % 1000).cast("string"), 3, "0"),
      lit("-"), lpad(((col("c_custkey") * 17) % 10000).cast("string"), 4, "0")))
    .withColumn("ssn", concat(
      lpad(((col("c_custkey") * 3) % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((col("c_custkey") % 100).cast("string"), 2, "0"), lit("-"),
      lpad(((col("c_custkey") * 11) % 10000).cast("string"), 4, "0")))
    .withColumn("card", concat(lit("4532"), lpad(col("c_custkey").cast("string"), 12, "0")))

  /** The same synthesis in the DuckDB dialect. */
  private val PiiSql =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
      |  lower(replace(c_name, '#', '.')) || '@example.com' AS email,
      |  '(' || lpad(CAST((c_custkey*7)%1000 AS VARCHAR), 3, '0') || ') ' ||
      |    lpad(CAST((c_custkey*13)%1000 AS VARCHAR), 3, '0') || '-' ||
      |    lpad(CAST((c_custkey*17)%10000 AS VARCHAR), 4, '0') AS phone,
      |  lpad(CAST((c_custkey*3)%1000 AS VARCHAR), 3, '0') || '-' ||
      |    lpad(CAST(c_custkey%100 AS VARCHAR), 2, '0') || '-' ||
      |    lpad(CAST((c_custkey*11)%10000 AS VARCHAR), 4, '0') AS ssn,
      |  '4532' || lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS card
      |FROM customer""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pii_mask_email" -> { (s, d) =>
      withPii(Tables.customer(s, d))
        .select(col("c_custkey"), col("email"),
          graft.api.Graft.maskEmail(col("email")).as("masked_email"))
        .orderBy("c_custkey")
    },

    "pii_mask_phone" -> { (s, d) =>
      // keep last 4 digits, format preserved (ref: pii.py:118 _mask_phone)
      withPii(Tables.customer(s, d))
        .select(col("c_custkey"), col("phone"),
          concat(lit("(***) ***-"), substring(col("phone"), 11, 4)).as("masked_phone"))
        .orderBy("c_custkey")
    },

    "pii_mask_ssn" -> { (s, d) =>
      withPii(Tables.customer(s, d))
        .select(col("c_custkey"), col("ssn"),
          concat(lit("***-**-"), substring(col("ssn"), 8, 4)).as("masked_ssn"))
        .orderBy("c_custkey")
    },

    "pii_mask_card" -> { (s, d) =>
      // 16-digit card, keep last 4 (ref: pii.py:173 _mask_credit_card);
      // length guard mirrors the 13..19-digit validation.
      withPii(Tables.customer(s, d))
        .select(col("c_custkey"), col("card"),
          when(length(col("card")).between(13, 19),
            concat(expr("repeat('*', length(card) - 4)"),
                   expr("substr(card, length(card) - 3)")))
            .otherwise(expr("repeat('*', length(card))")).as("masked_card"))
        .orderBy("c_custkey")
    },

    "pii_mask_ip" -> { (s, d) =>
      // keep the /16 prefix, mask host octets (ref: pii.py:209 _mask_ip_address)
      Tables.customer(s, d)
        .withColumn("ip", concat(
          lit("10."), (col("c_custkey") % 256).cast("string"),
          lit("."), ((col("c_custkey") * 7) % 256).cast("string"),
          lit("."), ((col("c_custkey") * 13) % 256).cast("string")))
        .select(col("c_custkey"), col("ip"),
          concat(lit("10."), (col("c_custkey") % 256).cast("string"), lit(".*.*")).as("masked_ip"))
        .orderBy("c_custkey")
    },

    "pii_mask_ip_full" -> { (s, d) =>
      // the reference's FULL ip anonymization semantics (pii.py:209):
      // IPv4 first-octet mask, IPv6 ::-expansion + network-prefix keep,
      // unrecognized-format fallback mask. One generic kernel
      // (Graft.maskIpFull) handles all four synthesized classes; the
      // oracle reproduces the expected shape per class.
      val id = col("c_custkey")
      Tables.customer(s, d)
        .withColumn("ip",
          when(id % 4 === 0, concat(lit("192.168."), (id % 256).cast("string"),
            lit("."), ((id * 7) % 256).cast("string")))
          .when(id % 4 === 1, concat(lit("2001:0db8:85a3:"),
            lpad((id % 9999).cast("string"), 4, "0"), lit(":0000:8a2e:0370:7334")))
          .when(id % 4 === 2, concat(lit("fe80::"),
            lpad((id % 9999).cast("string"), 4, "0")))
          .otherwise(concat(lit("host-"), id.cast("string"))))
        .select(id, col("ip"), graft.api.Graft.maskIpFull(col("ip")).as("masked_ip"))
        .orderBy("c_custkey")
    },

    "pii_hash" -> { (s, d) =>
      // salted SHA-256 pseudonymization (ref: pii.py:269 HashingTransformer)
      withPii(Tables.customer(s, d))
        .select(col("c_custkey"),
          sha2(concat(lit("graft-salt:"), col("email")), 256).as("email_hash"),
          sha2(concat(lit("graft-salt:"), col("ssn")), 256).as("ssn_hash"))
        .orderBy("c_custkey")
    },

    "pii_pipeline" -> { (s, d) =>
      // composed GDPR pipeline (ref: rules.py:68 create_gdpr_pipeline):
      // mask email+phone, hash the name, drop raw identifiers.
      withPii(Tables.customer(s, d))
        .select(col("c_custkey"),
          graft.api.Graft.maskEmail(col("email")).as("email"),
          concat(lit("(***) ***-"), substring(col("phone"), 11, 4)).as("phone"),
          sha2(concat(lit("graft-salt:"), col("c_name")), 256).as("name_hash"),
          col("c_mktsegment"))
        .orderBy("c_custkey")
    },

    "pii_rules_pipeline" -> { (s, d) =>
      // name-pattern-routed pipeline (ref: rules.py:17
      // create_pii_pipeline): transformers are bound to column-NAME
      // regexes, not hard-coded columns — the first matching rule wins,
      // unmatched columns pass through. Same mask/hash kernels as the
      // explicit pipeline above, selected by the router.
      import graft.api.Graft
      Graft.rulesPipeline(
          withPii(Tables.customer(s, d))
            .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
                    col("email"), col("phone"), col("ssn"), col("card")),
          Seq(
            ".*email.*" -> (c => Graft.maskEmail(c)),
            ".*phone.*" -> (c => Graft.maskKeepLast4(c)),
            ".*ssn.*"   -> (c => Graft.maskSsn(c)),
            ".*card.*"  -> (c => Graft.maskKeepLast4(c)),
            ".*name.*"  -> (c => Graft.pseudonymize(c, "graft-salt"))))
        .orderBy("c_custkey")
    },

    "type_convert" -> { (s, d) =>
      // cast matrix incl. the bool/int edge the reference special-cases
      // (ref: types.py:28 TypeConversionTransformer BUG-9). Double→int goes
      // through explicit floor: bare casts round in PG/DuckDB but truncate
      // in Spark/SQL Server — exactly the class of mismatch the reference's
      // type mapper exists to paper over.
      Tables.customer(s, d)
        .select(col("c_custkey"),
          col("c_custkey").cast("string").as("key_str"),
          col("c_custkey").cast("string").cast("long").as("key_roundtrip"),
          (col("c_nationkey") % 2 === 0).as("flag_bool"),
          (col("c_nationkey") % 2 === 0).cast("int").as("flag_int"),
          floor(col("c_acctbal")).cast("long").as("acctbal_floor"),
          col("c_acctbal").cast("string").as("acctbal_str"))
        .orderBy("c_custkey")
    },

    "conditional_transform" -> { (s, d) =>
      // predicate-gated transforms (ref: types.py:79 ConditionalTransformer):
      // tier by balance; mask email only for the BUILDING segment.
      withPii(Tables.customer(s, d))
        .select(col("c_custkey"), col("c_mktsegment"),
          when(col("c_acctbal") < 0, lit("NEGATIVE"))
            .when(col("c_acctbal") > 5000, lit("HIGH"))
            .otherwise(lit("NORMAL")).as("balance_tier"),
          when(col("c_mktsegment") === "BUILDING",
            graft.api.Graft.maskEmail(col("email")))
            .otherwise(col("email")).as("email_out"))
        .orderBy("c_custkey")
    }
  )

  // no-'@' values pass through unchanged, mirroring Graft.maskEmail
  // (and the reference's _mask_email non-email passthrough)
  private val maskEmailSql =
    """CASE WHEN instr(email, '@') = 0 THEN email
      | ELSE substr(email, 1, 1) || repeat('*', instr(email, '@') - 2)
      |   || substr(email, instr(email, '@')) END""".stripMargin.replace("\n", " ")

  def oracles: Map[String, String] = Map(
    "pii_mask_email" ->
      s"""SELECT c_custkey, email, $maskEmailSql AS masked_email
         |FROM ($PiiSql) t ORDER BY c_custkey""".stripMargin,

    "pii_mask_phone" ->
      s"""SELECT c_custkey, phone, '(***) ***-' || substr(phone, 11, 4) AS masked_phone
         |FROM ($PiiSql) t ORDER BY c_custkey""".stripMargin,

    "pii_mask_ssn" ->
      s"""SELECT c_custkey, ssn, '***-**-' || substr(ssn, 8, 4) AS masked_ssn
         |FROM ($PiiSql) t ORDER BY c_custkey""".stripMargin,

    "pii_mask_card" ->
      s"""SELECT c_custkey, card,
         |  CASE WHEN length(card) BETWEEN 13 AND 19
         |       THEN repeat('*', length(card) - 4) || substr(card, length(card) - 3)
         |       ELSE repeat('*', length(card)) END AS masked_card
         |FROM ($PiiSql) t ORDER BY c_custkey""".stripMargin,

    "pii_mask_ip" ->
      """SELECT c_custkey,
        |  '10.' || CAST(c_custkey % 256 AS VARCHAR) || '.' ||
        |    CAST((c_custkey*7) % 256 AS VARCHAR) || '.' ||
        |    CAST((c_custkey*13) % 256 AS VARCHAR) AS ip,
        |  '10.' || CAST(c_custkey % 256 AS VARCHAR) || '.*.*' AS masked_ip
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "pii_mask_ip_full" ->
      """WITH x AS (
        |  SELECT c_custkey,
        |    CASE c_custkey % 4
        |      WHEN 0 THEN '192.168.' || CAST(c_custkey % 256 AS VARCHAR)
        |        || '.' || CAST((c_custkey*7) % 256 AS VARCHAR)
        |      WHEN 1 THEN '2001:0db8:85a3:'
        |        || lpad(CAST(c_custkey % 9999 AS VARCHAR), 4, '0')
        |        || ':0000:8a2e:0370:7334'
        |      WHEN 2 THEN 'fe80::' || lpad(CAST(c_custkey % 9999 AS VARCHAR), 4, '0')
        |      ELSE 'host-' || CAST(c_custkey AS VARCHAR) END AS ip
        |  FROM customer)
        |SELECT c_custkey, ip,
        |  CASE c_custkey % 4
        |    WHEN 0 THEN '192.***.*.***'
        |    WHEN 1 THEN '2001:0db8:85a3:'
        |      || lpad(CAST(c_custkey % 9999 AS VARCHAR), 4, '0')
        |      || ':****:****:****:****'
        |    WHEN 2 THEN 'fe80:0000:0000:0000:****:****:****:****'
        |    ELSE substr(ip, 1, LEAST(4, length(ip)//2))
        |      || repeat('*', length(ip) - LEAST(4, length(ip)//2)) END AS masked_ip
        |FROM x ORDER BY c_custkey""".stripMargin,

    "pii_hash" ->
      s"""SELECT c_custkey,
         |  sha256('graft-salt:' || email) AS email_hash,
         |  sha256('graft-salt:' || ssn) AS ssn_hash
         |FROM ($PiiSql) t ORDER BY c_custkey""".stripMargin,

    "pii_pipeline" ->
      s"""SELECT c_custkey,
         |  $maskEmailSql AS email,
         |  '(***) ***-' || substr(phone, 11, 4) AS phone,
         |  sha256('graft-salt:' || c_name) AS name_hash,
         |  c_mktsegment
         |FROM ($PiiSql) t ORDER BY c_custkey""".stripMargin,

    "pii_rules_pipeline" ->
      s"""SELECT c_custkey,
         |  ('0x' || substr(md5('graft-salt|' || c_name), 1, 15))::BIGINT AS c_name,
         |  c_mktsegment,
         |  $maskEmailSql AS email,
         |  repeat('*', greatest(length(regexp_replace(phone, '[^0-9]', '', 'g')) - 4, 0))
         |    || right(regexp_replace(phone, '[^0-9]', '', 'g'), 4) AS phone,
         |  '***-**-' || right(ssn, 4) AS ssn,
         |  repeat('*', greatest(length(card) - 4, 0)) || right(card, 4) AS card
         |FROM ($PiiSql) t ORDER BY c_custkey""".stripMargin,

    "type_convert" ->
      """SELECT c_custkey,
        |  CAST(c_custkey AS VARCHAR) AS key_str,
        |  CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
        |  c_nationkey % 2 = 0 AS flag_bool,
        |  CAST(c_nationkey % 2 = 0 AS INT) AS flag_int,
        |  CAST(FLOOR(c_acctbal) AS BIGINT) AS acctbal_floor,
        |  CAST(c_acctbal AS VARCHAR) AS acctbal_str
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "conditional_transform" ->
      s"""SELECT c_custkey, c_mktsegment,
         |  CASE WHEN c_acctbal < 0 THEN 'NEGATIVE'
         |       WHEN c_acctbal > 5000 THEN 'HIGH'
         |       ELSE 'NORMAL' END AS balance_tier,
         |  CASE WHEN c_mktsegment = 'BUILDING' THEN $maskEmailSql
         |       ELSE email END AS email_out
         |FROM ($PiiSql) t ORDER BY c_custkey""".stripMargin
  )
}

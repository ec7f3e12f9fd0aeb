package graft.queries

import graft.sql.AgeFunctions
import graft.secrets.{AgeSecretManager, AgeSecretOptions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference extension's own operator surface (SURVEY.md §2A) as
  * verifiable queries. Ciphertexts and fresh keys are random by design
  * (rust/src/lib.rs:100-107), so every projection is a deterministic
  * invariant — round-trip equality, prefix predicates, length relations —
  * and the DuckDB oracle states the expected constant outcome
  * (SURVEY.md §5.4 determinism discipline).
  */
object CryptoQueries {
  val pubA = "age1j2tqev8spvn9s9ktkr750ntl03sy20f7dck0mdyetway3cj2naasngwz3u"
  val privA = "AGE-SECRET-KEY-1DMYUTPVUSD3M7HMU4K5KXNZ65JZVC9J04MSVV2J8Y4NE8GZCVU6ST7DRT2"
  private val wrongKey =
    "AGE-SECRET-KEY-1AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"

  private def prepared(s: SparkSession, d: String): DataFrame = {
    AgeFunctions.register(s)
    Tables.load(s, d, "customer").filter(col("c_custkey") <= 50)
      .createOrReplaceTempView("customer_small")
    s.table("customer_small")
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("age01_version_ok", (s, d) => {
      AgeFunctions.register(s)
      s.sql("SELECT age_version() IS NOT NULL AS ok")
    }, Some("SELECT true AS ok")),

    // test/sql/age.test:9-17
    QueryDef("age02_keygen_format", (s, d) => {
      AgeFunctions.register(s)
      s.sql("""
        SELECT (age_keygen()).public_key LIKE 'age1%' AS pub_ok,
               (age_keygen()).private_key LIKE 'AGE-SECRET-KEY-1%' AS priv_ok""")
    }, Some("SELECT true AS pub_ok, true AS priv_ok")),

    // test/sql/age.test:53-57 (roundtrip) over 50 rows of real data
    QueryDef("age03_roundtrip", (s, d) => {
      prepared(s, d)
      s.sql(s"""
        SELECT c_custkey,
               age_decrypt(age_encrypt(CAST(c_name AS BINARY), '$pubA'), '$privA')
                 = CAST(c_name AS BINARY) AS ok
        FROM customer_small ORDER BY c_custkey""")
    }, Some("SELECT c_custkey, true AS ok FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey")),

    // test/sql/age.test:102-111 (multi-recipient, fresh keypair per run)
    QueryDef("age04_roundtrip_multi", (s, d) => {
      prepared(s, d)
      s.sql(s"""
        WITH k AS (SELECT age_keygen() AS kp),
        enc AS (
          SELECT c.c_custkey, kp.private_key AS sk,
                 age_encrypt_multi(CAST(c.c_name AS BINARY),
                                   array('$pubA', kp.public_key)) AS ct,
                 CAST(c.c_name AS BINARY) AS pt
          FROM customer_small c CROSS JOIN k)
        SELECT c_custkey, age_decrypt(ct, '$privA') = pt AS ok1,
               age_decrypt(ct, sk) = pt AS ok2
        FROM enc ORDER BY c_custkey""")
    }, Some("SELECT c_custkey, true AS ok1, true AS ok2 FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey")),

    // deterministic seeded keygen (SURVEY.md §1.4.3 — fixed vs reference)
    QueryDef("age05_seed_deterministic", (s, d) => {
      prepared(s, d)
      s.sql("""
        SELECT c_custkey,
               age_keygen_from_seed(CAST(c_name AS BINARY)) =
                 age_keygen_from_seed(CAST(c_name AS BINARY)) AS same,
               (age_keygen_from_seed(CAST(c_name AS BINARY))).public_key
                 LIKE 'age1%' AS pub_ok
        FROM customer_small ORDER BY c_custkey""")
    }, Some("SELECT c_custkey, true AS same, true AS pub_ok FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey")),

    // secret-name resolution end-to-end (test/sql/age.test:59-75)
    QueryDef("age06_secret_roundtrip", (s, d) => {
      AgeSecretManager.get("verify_secret") match {
        case None =>
          AgeSecretManager.create("verify_secret",
            AgeSecretOptions(publicKey = Some(pubA), privateKey = Some(privA)))
        case Some(_) => ()
      }
      prepared(s, d)
      s.sql("""
        SELECT c_custkey,
               age_decrypt(age_encrypt(CAST(c_name AS BINARY), 'verify_secret'),
                           'verify_secret') = CAST(c_name AS BINARY) AS ok
        FROM customer_small ORDER BY c_custkey""")
    }, Some("SELECT c_custkey, true AS ok FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey")),

    // wrong key fails per row (age.test:83-90), surfaced as NULL
    QueryDef("age07_wrong_key_null", (s, d) => {
      prepared(s, d)
      s.sql(s"""
        SELECT c_custkey,
               age_try_decrypt(age_encrypt(CAST(c_name AS BINARY), '$pubA'),
                               '$wrongKey') IS NULL AS failed
        FROM customer_small ORDER BY c_custkey""")
    }, Some("SELECT c_custkey, true AS failed FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey")),

    // structural invariant: age ciphertext = header + nonce + chunked AEAD,
    // so length exceeds plaintext (only length-class assertion allowed, §5.4)
    QueryDef("age08_ciphertext_len", (s, d) => {
      prepared(s, d)
      s.sql(s"""
        SELECT c_custkey,
               length(age_encrypt(CAST(c_name AS BINARY), '$pubA'))
                 > length(CAST(c_name AS BINARY)) AS longer,
               length(age_encrypt_multi(CAST(c_name AS BINARY), array('$pubA')))
                 > length(CAST(c_name AS BINARY)) AS longer_multi
        FROM customer_small ORDER BY c_custkey""")
    }, Some("SELECT c_custkey, true AS longer, true AS longer_multi FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey")),

    // kernel throughput probe: 64 rows x 1 MiB through encrypt+decrypt in
    // parallel — aggregate MB/s across cores, against the reference's
    // 50-100 MB/s single-core claim (FUNCTIONS.md:466-467; BASELINE.md).
    // The raw kernel does ~115 MB/s encrypt / ~150 MB/s decrypt per core
    // (CryptoCoreSpec-adjacent microbench); this query adds Spark row
    // plumbing and runs one blob per task.
    QueryDef("age10_kernel_64mb", (s, d) => {
      AgeFunctions.register(s)
      s.range(0, 64).toDF("row_id")
        .repartition(32)
        .selectExpr("row_id",
          s"length(age_decrypt(age_encrypt(CAST(repeat('x', 1048576) AS BINARY), " +
            s"'$pubA'), '$privA')) = 1048576 AS ok")
        .orderBy("row_id")
    }, Some("SELECT CAST(i AS BIGINT) AS row_id, true AS ok FROM generate_series(0, 63) t(i) ORDER BY row_id")),

    // key rotation (FUNCTIONS.md:422-431 documented workflow): re-encrypt
    // from key A to a seeded key B and verify the new ciphertext decrypts
    QueryDef("age11_key_rotation", (s, d) => {
      prepared(s, d)
      s.sql(s"""
        WITH newkey AS (SELECT age_keygen_from_seed(CAST('rotation-2026' AS BINARY)) AS kp),
        rotated AS (
          SELECT c.c_custkey,
                 CAST(c.c_name AS BINARY) AS original,
                 age_encrypt(age_decrypt(age_encrypt(CAST(c.c_name AS BINARY), '$pubA'),
                                         '$privA'), kp.public_key) AS ct_new,
                 kp.private_key AS sk_new
          FROM customer_small c CROSS JOIN newkey)
        SELECT c_custkey, age_decrypt(ct_new, sk_new) = original AS rotated_ok
        FROM rotated ORDER BY c_custkey""")
    }, Some("SELECT c_custkey, true AS rotated_ok FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey")),

    // ASCII armor (age spec; beyond the reference's binary-only surface):
    // armored output is strict PEM-style text and decrypt auto-detects it
    QueryDef("age12_armor_roundtrip", (s, d) => {
      prepared(s, d)
      s.sql(s"""
        WITH armored AS (
          SELECT c_custkey, CAST(c_name AS BINARY) AS pt,
                 age_encrypt_armor(CAST(c_name AS BINARY), '$pubA') AS ct_text
          FROM customer_small)
        SELECT c_custkey,
               ct_text LIKE '-----BEGIN AGE ENCRYPTED FILE-----%' AS armored_ok,
               age_decrypt(CAST(ct_text AS BINARY), '$privA') = pt AS roundtrip_ok
        FROM armored ORDER BY c_custkey""")
    }, Some("SELECT c_custkey, true AS armored_ok, true AS roundtrip_ok FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey")),

    // passphrase (scrypt stanza) encryption — age spec's second recipient
    // type, beyond the reference's X25519-only surface. Invariant
    // projection: roundtrip equality + wrong-passphrase structural check
    // (scrypt stanza present means X25519 identities can never open it)
    QueryDef("age13_passphrase_roundtrip", (s, d) => {
      prepared(s, d)
      s.sql("""
        SELECT c_custkey,
               age_decrypt_pass(age_encrypt_pass(CAST(c_name AS BINARY), c_name),
                                c_name) = CAST(c_name AS BINARY) AS ok
        FROM customer_small ORDER BY c_custkey""")
    }, Some("SELECT c_custkey, true AS ok FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey")),

    // encrypted-column pipeline: encrypt → filter/join on plaintext-derived
    // cols → decrypt (the composition the rebuild exists for)
    QueryDef("age09_pipeline_joined", (s, d) => {
      AgeFunctions.register(s)
      Tables.registerViews(s, d)
      s.sql(s"""
        WITH enc AS (
          SELECT c_custkey, c_nationkey,
                 age_encrypt(CAST(c_name AS BINARY), '$pubA') AS name_enc
          FROM customer WHERE c_custkey <= 30)
        SELECT e.c_custkey, n.n_name,
               CAST(age_decrypt(e.name_enc, '$privA') AS STRING) AS name_dec
        FROM enc e JOIN nation n ON e.c_nationkey = n.n_nationkey
        ORDER BY e.c_custkey""")
    }, Some("""
      SELECT c_custkey, n_name, c_name AS name_dec
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE c_custkey <= 30 ORDER BY c_custkey"""))
  )
}

package graft.sql

import graft.TestSpark
import graft.secrets.{AgeSecretManager, AgeSecretOptions}
import org.apache.spark.sql.Row
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** 1:1 port of /root/reference/test/sql/age.test (133 lines) — one test per
  * SQLLogicTest block, same expected values and error-message substrings. */
class AgeSqlSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark

  val pubA = "age1j2tqev8spvn9s9ktkr750ntl03sy20f7dck0mdyetway3cj2naasngwz3u"
  val privA = "AGE-SECRET-KEY-1DMYUTPVUSD3M7HMU4K5KXNZ65JZVC9J04MSVV2J8Y4NE8GZCVU6ST7DRT2"

  override def beforeAll(): Unit = {
    AgeSecretManager.clear()
    AgeFunctions.register(spark)
  }

  private def sql1(q: String): Any = spark.sql(q).collect()(0).get(0)

  /** SQLLogicTest `statement error` + expected-substring semantics: walk
    * the Spark exception cause chain for the reference message. */
  private def assertErrorContains(q: String, substring: String): Unit = {
    val e = intercept[Throwable](spark.sql(q).collect())
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains(substring)),
      s"expected substring '$substring' in cause chain: ${messages.mkString(" | ")}")
  }

  // age.test:9-17
  test("age_keygen public/private key format") {
    assert(sql1("SELECT (age_keygen()).public_key LIKE 'age1%'") == true)
    assert(sql1("SELECT (age_keygen()).private_key LIKE 'AGE-SECRET-KEY-1%'") == true)
  }

  // age.test:19-22
  test("age_encrypt with valid key") {
    assert(sql1(
      """WITH keys AS (SELECT (age_keygen()).public_key AS pubkey)
        |SELECT age_encrypt(CAST('hello world' AS BINARY), pubkey) IS NOT NULL FROM keys
        |""".stripMargin) == true)
  }

  // age.test:24-40
  test("age_encrypt error cases") {
    assertErrorContains("SELECT age_encrypt(CAST('hello world' AS BINARY), 'invalid_key')",
      "Invalid age recipient key: invalid_key")
    assertErrorContains("SELECT age_encrypt(CAST('hello world' AS BINARY), 'age1invalid')",
      "Invalid age recipient key: age1invalid")
    assertErrorContains("SELECT age_encrypt(CAST('hello world' AS BINARY), '')",
      "Invalid age recipient key:  (not a valid age key or secret name)")
  }

  // age.test:42-47
  test("age_encrypt with secret name") {
    AgeSecretManager.create("test_secret",
      AgeSecretOptions(publicKey = Some(pubA), privateKey = Some(privA)))
    assert(sql1("SELECT age_encrypt(CAST('hello world' AS BINARY), 'test_secret') IS NOT NULL") == true)
  }

  // age.test:49-57 (CTAS materializes the keypair, as in the reference)
  test("age_decrypt roundtrip via table-stored keys") {
    spark.sql("DROP TABLE IF EXISTS test_keypair")
    spark.sql("CREATE TABLE test_keypair AS SELECT age_keygen() AS kp")
    assert(sql1(
      """WITH keys AS (SELECT kp.public_key AS pubkey, kp.private_key AS privkey FROM test_keypair)
        |SELECT age_decrypt(age_encrypt(CAST('test message' AS BINARY), pubkey), privkey)
        |       = CAST('test message' AS BINARY) FROM keys""".stripMargin) == true)
  }

  // age.test:59-75
  test("age_decrypt with secret name / both secrets") {
    assert(sql1(
      s"""SELECT age_decrypt(
         |  age_encrypt(CAST('secret test' AS BINARY), '$pubA'), 'test_secret')
         |  = CAST('secret test' AS BINARY)""".stripMargin) == true)
    assert(sql1(
      """SELECT age_decrypt(
        |  age_encrypt(CAST('both secrets' AS BINARY), 'test_secret'), 'test_secret')
        |  = CAST('both secrets' AS BINARY)""".stripMargin) == true)
  }

  // age.test:77-96
  test("age_decrypt error cases: invalid / wrong / empty key") {
    assertErrorContains(
      s"SELECT age_decrypt(age_encrypt(CAST('test' AS BINARY), '$pubA'), 'invalid_key')",
      "Invalid age identity key: invalid_key (not a valid age key or secret name)")
    assertErrorContains(
      s"""SELECT age_decrypt(age_encrypt(CAST('test' AS BINARY), '$pubA'),
         | 'AGE-SECRET-KEY-1AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA')""".stripMargin,
      "Decryption failed")
    assertErrorContains(
      s"SELECT age_decrypt(age_encrypt(CAST('test' AS BINARY), '$pubA'), '')",
      "Invalid age identity key:  (not a valid age key or secret name)")
  }

  // age.test:98-111
  test("age_encrypt_multi roundtrip with both keys") {
    spark.sql("DROP TABLE IF EXISTS multi_keys")
    spark.sql("CREATE TABLE multi_keys AS SELECT age_keygen() AS k1, age_keygen() AS k2")
    val row = spark.sql(
      """WITH k AS (SELECT k1.public_key AS pk1, k2.public_key AS pk2,
        |                  k1.private_key AS sk1, k2.private_key AS sk2 FROM multi_keys),
        |     encrypted AS (SELECT age_encrypt_multi(CAST('multi test' AS BINARY),
        |                                            array(pk1, pk2)) AS data FROM k)
        |SELECT age_decrypt(data, sk1) = CAST('multi test' AS BINARY),
        |       age_decrypt(data, sk2) = CAST('multi test' AS BINARY)
        |FROM k CROSS JOIN encrypted""".stripMargin).collect()(0)
    assert(row == Row(true, true))
  }

  // age.test:113-123
  test("age_encrypt_multi error cases") {
    assertErrorContains(
      "SELECT age_encrypt_multi(CAST('test' AS BINARY), CAST(array() AS ARRAY<STRING>))",
      "Recipients list cannot be empty")
    assertErrorContains(
      "SELECT age_encrypt_multi(CAST('test' AS BINARY), array('invalid_key'))",
      "Invalid recipient: invalid_key")
  }

  // age.test:125-133
  test("age_encrypt_multi with mix of keys and secrets") {
    AgeSecretManager.create("multi_test_secret",
      AgeSecretOptions(publicKey = Some(pubA), privateKey = Some(privA)))
    assert(sql1(
      """WITH k AS (SELECT k1.public_key AS pk1 FROM multi_keys)
        |SELECT age_encrypt_multi(CAST('mixed' AS BINARY),
        |                         array(pk1, 'multi_test_secret')) IS NOT NULL FROM k
        |""".stripMargin) == true)
  }

  // beyond the reference: rust position-indexed error (rust/src/lib.rs:285)
  test("age_encrypt_multi raw malformed key reports position") {
    assertErrorContains(
      "SELECT age_encrypt_multi(CAST('test' AS BINARY), array('age1invalid'))",
      "Invalid recipient at position 0: age1invalid")
  }

  // NULL propagation (BinaryExecutor null semantics)
  test("NULL inputs propagate NULL, not errors") {
    assert(sql1(s"SELECT age_encrypt(CAST(NULL AS BINARY), '$pubA')") == null)
    assert(sql1("SELECT age_encrypt(CAST('x' AS BINARY), CAST(NULL AS STRING))") == null)
    assert(sql1(s"SELECT age_decrypt(CAST(NULL AS BINARY), '$privA')") == null)
  }

  // our additive surface
  test("age_try_decrypt returns NULL on failure, plaintext on success") {
    assert(sql1(
      s"""SELECT age_try_decrypt(age_encrypt(CAST('ok' AS BINARY), '$pubA'),
         | 'AGE-SECRET-KEY-1AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA')
         |""".stripMargin) == null)
    assert(sql1(
      s"""SELECT age_try_decrypt(age_encrypt(CAST('ok' AS BINARY), '$pubA'), '$privA')
         | = CAST('ok' AS BINARY)""".stripMargin) == true)
  }

  test("age_keygen_from_seed deterministic through SQL") {
    assert(sql1(
      """SELECT age_keygen_from_seed(CAST('s1' AS BINARY)) =
        |       age_keygen_from_seed(CAST('s1' AS BINARY))""".stripMargin) == true)
    assert(sql1(
      """SELECT (age_keygen_from_seed(CAST('s1' AS BINARY))).public_key LIKE 'age1%'
        |""".stripMargin) == true)
  }
}

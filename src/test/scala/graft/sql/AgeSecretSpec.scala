package graft.sql

import graft.TestSpark
import graft.core.AgeInvalidInputException
import graft.secrets.{AgeSecretManager, AgeSecretOptions}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** 1:1 port of /root/reference/test/sql/age_secret.test (121 lines).
  * CREATE/DROP SECRET DDL maps to the AgeSecretManager API; the
  * `duckdb_secrets()` listing maps to the `age_secrets` temp view.
  * File fixtures mirror the reference CI seeding
  * (.github/workflows/test.yml:95-97). */
class AgeSecretSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark

  val pubB = "age1ql3z7hjy54pw3hyww5ayyfg7zqgvc7w3j2elw8zmrj2kg5sfn9aqmcac8p"
  val privB = "AGE-SECRET-KEY-1QTAYQ69LA4P3QQN0VQPSJMG2WHVSQPQ3SG2F55M0XWDE9VQN0SZQCGUGJ8"

  override def beforeAll(): Unit = {
    AgeSecretManager.clear()
    AgeFunctions.register(spark)
    // CI-seeded key files (test.yml:95-97); trailing newline exercises trim
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/test_public_key.txt"), pubB + "\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/test_private_key.txt"), privB)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/invalid_public_key.txt"), "this is not an age key")
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get("/tmp/nonexistent_key.txt"))
  }

  private def sql1(q: String): Any = spark.sql(q).collect()(0).get(0)
  private def createErr(name: String, opts: AgeSecretOptions, substring: String): Unit = {
    val e = intercept[AgeInvalidInputException](AgeSecretManager.create(name, opts))
    assert(e.getMessage.contains(substring), e.getMessage)
  }

  // age_secret.test:8-12
  test("age_version smoke") {
    assert(sql1("SELECT age_version() IS NOT NULL") == true)
    assert(sql1("SELECT age_version()").toString.nonEmpty)
  }

  // age_secret.test:14-26
  test("create secret and list it") {
    AgeSecretManager.create("test_age_key",
      AgeSecretOptions(publicKey = Some(pubB), privateKey = Some(privB)))
    val rows = spark.sql(
      "SELECT name, type, provider FROM age_secrets WHERE name = 'test_age_key'").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
      == Seq(("test_age_key", "age", "config")))
  }

  // age_secret.test:28-41
  test("key_id variant + count") {
    AgeSecretManager.create("my_age_key",
      AgeSecretOptions(publicKey = Some(pubB), privateKey = Some(privB),
        keyId = Some("personal_key")))
    assert(AgeSecretManager.get("my_age_key").get.keyId.contains("personal_key"))
    assert(sql1("SELECT COUNT(*) FROM age_secrets WHERE type = 'age'") == 2L)
  }

  // age_secret.test:43-61
  test("prefix validation errors") {
    createErr("bad_public_key",
      AgeSecretOptions(publicKey = Some("invalid_key"), privateKey = Some(privB)),
      "Age public key must start with 'age1'")
    createErr("bad_private_key",
      AgeSecretOptions(publicKey = Some(pubB), privateKey = Some("invalid_private_key")),
      "Age private key must start with 'AGE-SECRET-KEY-1'")
  }

  // age_secret.test:63-76
  test("file-based keys (with whitespace trim)") {
    AgeSecretManager.create("file_based_key",
      AgeSecretOptions(publicKeyFile = Some("/tmp/test_public_key.txt"),
        privateKeyFile = Some("/tmp/test_private_key.txt"), keyId = Some("file_key")))
    val rows = spark.sql(
      "SELECT name, type, provider FROM age_secrets WHERE name = 'file_based_key'").collect()
    assert(rows.length == 1 && rows(0).getString(1) == "age")
    // trim happened: the stored key equals pubB with no trailing newline
    assert(AgeSecretManager.get("file_based_key").get.publicKey.contains(pubB))
    // the file-based secret works through SQL. NOTE: the reference's own
    // fixture private key B (age_secret.test:19) is bech32-INVALID (bad
    // checksum) — its tests only ever create secrets with it, never
    // decrypt; so we exercise the valid public half here.
    assert(sql1(
      "SELECT age_encrypt(CAST('file key test' AS BINARY), 'file_based_key') IS NOT NULL") == true)
  }

  // age_secret.test:78-86
  test("cannot specify both inline and file keys") {
    createErr("mixed_key",
      AgeSecretOptions(publicKey = Some(pubB), publicKeyFile = Some("/tmp/test_public_key.txt")),
      "Cannot specify both 'public_key' and 'public_key_file'")
  }

  // age_secret.test:88-96
  test("invalid key format in file") {
    createErr("invalid_file_key",
      AgeSecretOptions(publicKeyFile = Some("/tmp/invalid_public_key.txt"),
        privateKeyFile = Some("/tmp/test_private_key.txt")),
      "Age public key from file must start with 'age1'")
  }

  // age_secret.test:98-106
  test("non-existent key file") {
    createErr("missing_file_key",
      AgeSecretOptions(publicKeyFile = Some("/tmp/nonexistent_key.txt"),
        privateKeyFile = Some("/tmp/test_private_key.txt")),
      "Failed to read public key file")
  }

  // age_secret.test:108-122
  test("drop secrets and count to zero") {
    AgeSecretManager.drop("test_age_key")
    AgeSecretManager.drop("my_age_key")
    AgeSecretManager.drop("file_based_key")
    assert(sql1("SELECT COUNT(*) FROM age_secrets WHERE type = 'age'") == 0L)
    val e = intercept[AgeInvalidInputException](AgeSecretManager.drop("test_age_key"))
    assert(e.getMessage.contains("Secret 'test_age_key' not found"))
  }

  test("redaction: private key never in toString") {
    AgeSecretManager.create("redact_check",
      AgeSecretOptions(publicKey = Some(pubB), privateKey = Some(privB)))
    val s = AgeSecretManager.get("redact_check").get.toString
    assert(!s.contains(privB) && s.contains("REDACTED"))
    AgeSecretManager.drop("redact_check")
  }
}

package graft.sql

import graft.TestSpark
import graft.secrets.AgeSecretManager
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The age_secret.test DDL statements through actual spark.sql — full SQL
  * parity with the reference's CREATE/DROP SECRET surface (the parser is
  * injected via GraftSparkExtensions in TestSpark). */
class AgeDdlSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark

  val pubB = "age1ql3z7hjy54pw3hyww5ayyfg7zqgvc7w3j2elw8zmrj2kg5sfn9aqmcac8p"
  val privB = "AGE-SECRET-KEY-1QTAYQ69LA4P3QQN0VQPSJMG2WHVSQPQ3SG2F55M0XWDE9VQN0SZQCGUGJ8"

  override def beforeAll(): Unit = {
    AgeSecretManager.clear()
    AgeFunctions.register(spark)
  }

  private def errContains(q: String, substring: String): Unit = {
    val e = intercept[Throwable](spark.sql(q).collect())
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains(substring)), msgs.mkString(" | "))
  }

  // age_secret.test:14-26, multi-line exactly as the reference writes it
  test("CREATE SECRET through SQL, listed in age_secrets") {
    spark.sql(s"""
      CREATE SECRET test_age_key (
          TYPE 'age',
          public_key '$pubB',
          private_key '$privB'
      )""")
    val rows = spark.sql(
      "SELECT name, type, provider FROM age_secrets WHERE name = 'test_age_key'").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("test_age_key"))
  }

  // age_secret.test:28-41
  test("CREATE SECRET with key_id; count") {
    spark.sql(s"""
      CREATE SECRET my_age_key (
          TYPE 'age',
          public_key '$pubB',
          private_key '$privB',
          key_id 'personal_key'
      )""")
    assert(spark.sql("SELECT COUNT(*) FROM age_secrets WHERE type = 'age'")
      .collect()(0).getLong(0) == 2L)
  }

  // age_secret.test:43-61 — DDL-level validation errors
  test("CREATE SECRET validation errors through SQL") {
    errContains(s"""
      CREATE SECRET bad_public_key (
          TYPE 'age', public_key 'invalid_key', private_key '$privB')""",
      "Age public key must start with 'age1'")
    errContains(s"""
      CREATE SECRET bad_private_key (
          TYPE 'age', public_key '$pubB', private_key 'invalid_private_key')""",
      "Age private key must start with 'AGE-SECRET-KEY-1'")
    errContains("CREATE SECRET wrong_type (TYPE 's3', public_key 'x')",
      "Secret type must be 'age'")
  }

  // age_secret.test:108-122
  test("DROP SECRET through SQL; count to zero; age_encrypt sees the change") {
    assert(AgeSecretManager.get("test_age_key").isDefined)
    // usable before drop
    assert(spark.sql(
      "SELECT age_encrypt(CAST('x' AS BINARY), 'test_age_key') IS NOT NULL")
      .collect()(0).getBoolean(0))
    spark.sql("DROP SECRET test_age_key")
    spark.sql("DROP SECRET my_age_key")
    assert(spark.sql("SELECT COUNT(*) FROM age_secrets WHERE type = 'age'")
      .collect()(0).getLong(0) == 0L)
    errContains("SELECT age_encrypt(CAST('x' AS BINARY), 'test_age_key')",
      "Invalid age recipient key: test_age_key")
    errContains("DROP SECRET test_age_key", "Secret 'test_age_key' not found")
  }

  test("non-secret SQL passes through the delegating parser untouched") {
    assert(spark.sql("SELECT 1 + 1").collect()(0).get(0) == 2)
    // a query merely mentioning the words is not intercepted
    assert(spark.sql("SELECT 'CREATE SECRET x' AS s").collect()(0).getString(0)
      == "CREATE SECRET x")
  }
}

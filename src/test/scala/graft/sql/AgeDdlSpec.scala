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

  test("age_secrets() table function: live registry view, no args") {
    // catalog-injected TVF (duckdb_secrets() parity) — reflects the
    // registry at each query's analysis time
    spark.sql(s"""
      CREATE OR REPLACE SECRET tvf_probe (
          TYPE 'age', public_key '$pubB', private_key '$privB')""")
    val rows = spark.sql(
      "SELECT name, type, provider, key_id FROM age_secrets() WHERE name = 'tvf_probe'")
      .collect()
    assert(rows.length == 1)
    assert(rows(0).getString(1) == "age" && rows(0).getString(2) == "config")
    spark.sql("DROP SECRET tvf_probe")
    assert(spark.sql(
      "SELECT * FROM age_secrets() WHERE name = 'tvf_probe'").collect().isEmpty)
    // argument misuse fails fast
    val e = intercept[Throwable](spark.sql("SELECT * FROM age_secrets(1)").collect())
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("takes no arguments")), msgs.mkString(" | "))
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

  // reference FUNCTIONS.md:414-419 — the documented key-rotation workflow:
  // secret parameters can be scalar subqueries evaluated at run time
  test("CREATE SECRET with PUBLIC_KEY (SELECT ...) scalar subquery") {
    spark.sql("""
      CREATE SECRET rotation_key (
          TYPE age,
          PUBLIC_KEY (SELECT (age_keygen()).public_key)
      )""")
    val s = AgeSecretManager.get("rotation_key").get
    assert(s.publicKey.exists(_.startsWith("age1")))
    // usable for encryption immediately
    assert(spark.sql(
      "SELECT age_encrypt(CAST('x' AS BINARY), 'rotation_key') IS NOT NULL")
      .collect()(0).getBoolean(0))
    spark.sql("DROP SECRET rotation_key")
  }

  test("key-rotation workflow end-to-end: subquery-created keypair secret decrypts") {
    // both halves from one seeded keygen so the pair is consistent;
    // the subqueries run against the session at command execution time
    spark.sql("""
      CREATE SECRET rotated (
          TYPE age,
          PUBLIC_KEY (SELECT (age_keygen_from_seed(CAST('rot' AS BINARY))).public_key),
          PRIVATE_KEY (SELECT (age_keygen_from_seed(CAST('rot' AS BINARY))).private_key)
      )""")
    val ok = spark.sql("""
      SELECT age_decrypt(age_encrypt(CAST('payload' AS BINARY), 'rotated'),
                         'rotated') = CAST('payload' AS BINARY)""")
      .collect()(0).getBoolean(0)
    assert(ok)
    spark.sql("DROP SECRET rotated")
  }

  test("subquery errors: non-scalar and NULL results are rejected") {
    errContains("""
      CREATE SECRET bad_subq (TYPE age,
        PUBLIC_KEY (SELECT pub FROM (SELECT 'age1a' AS pub UNION ALL SELECT 'age1b')))""",
      "Secret parameter subquery must return exactly one value")
    errContains("""
      CREATE SECRET bad_null (TYPE age, PUBLIC_KEY (SELECT CAST(NULL AS STRING)))""",
      "Secret parameter subquery returned NULL")
  }

  test("age_secrets listing carries key_id") {
    spark.sql(s"""
      CREATE SECRET with_kid (
          TYPE 'age', public_key '$pubB', key_id 'personal_key')""")
    val rows = spark.sql(
      "SELECT key_id FROM age_secrets WHERE name = 'with_kid'").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("personal_key"))
    spark.sql("DROP SECRET with_kid")
  }

  test("duplicate-name semantics: error / OR REPLACE / IF NOT EXISTS") {
    spark.sql(s"CREATE SECRET dup_test (TYPE age, public_key '$pubB')")
    errContains(s"CREATE SECRET dup_test (TYPE age, public_key '$pubB')",
      "Secret with name 'dup_test' already exists")
    // IF NOT EXISTS keeps the existing secret
    spark.sql(s"CREATE SECRET IF NOT EXISTS dup_test (TYPE age, key_id 'other')")
    assert(AgeSecretManager.get("dup_test").get.keyId.isEmpty)
    // OR REPLACE overwrites
    spark.sql(
      s"CREATE OR REPLACE SECRET dup_test (TYPE age, public_key '$pubB', key_id 'v2')")
    assert(AgeSecretManager.get("dup_test").get.keyId.contains("v2"))
    errContains(s"CREATE OR REPLACE SECRET IF NOT EXISTS x (TYPE age)",
      "Cannot combine OR REPLACE with IF NOT EXISTS")
    spark.sql("DROP SECRET dup_test")
  }

  test("non-secret SQL passes through the delegating parser untouched") {
    assert(spark.sql("SELECT 1 + 1").collect()(0).get(0) == 2)
    // a query merely mentioning the words is not intercepted
    assert(spark.sql("SELECT 'CREATE SECRET x' AS s").collect()(0).getString(0)
      == "CREATE SECRET x")
  }

  // The parameter scanner is hand-rolled index arithmetic over the body
  // text; a malformed body must surface as the library's error (or a
  // normal parse error), NEVER as StringIndexOutOfBounds or an infinite
  // loop. Deterministic seed → reproducible corpus.
  test("parser fuzz: random parameter bodies fail cleanly or parse") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab_09'(),  =\t\nPUBLIC_KEY".toCharArray
    var parsed = 0; var rejected = 0
    for (_ <- 1 to 500) {
      val body = Array.fill(rnd.nextInt(40))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      try {
        spark.sql(s"CREATE SECRET fuzz_t (TYPE age, $body)")
        parsed += 1
        spark.sql("DROP SECRET fuzz_t")
      } catch {
        case e: graft.core.AgeInvalidInputException => rejected += 1
        case e: org.apache.spark.sql.AnalysisException => rejected += 1
        case e: org.apache.spark.sql.catalyst.parser.ParseException => rejected += 1
        case e: Throwable if e.getCause != null &&
          e.getCause.isInstanceOf[graft.core.AgeInvalidInputException] => rejected += 1
      } // anything else (StringIndexOutOfBounds, NPE, hang) fails the test
    }
    assert(parsed + rejected == 500)
    assert(rejected > 0) // the corpus does contain garbage
  }
}

package graft.sql

import graft.TestSpark
import graft.queries.CryptoQueries.{privA, pubA}
import org.apache.spark.sql.functions.{col, lit, array}
import org.scalatest.funsuite.AnyFunSuite

final case class Doc(doc_id: Long, text: String)
final case class SecureDoc(doc_id: Long, ct: Array[Byte])

/** The Column-DSL façade (graft.sql.functions) and a typed Dataset[T]
  * pipeline — the Scala-native surfaces a Spark user composes with,
  * exercised without any SQL strings. */
class ColumnDslSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("crypto round-trip through the Column DSL, no SQL strings") {
    import graft.sql.{functions => F}
    import spark.implicits._
    AgeFunctions.register(spark)
    val docs = Seq(Doc(1, "alpha"), Doc(2, "beta")).toDS()
    val enc = docs.select(col("doc_id"),
      F.age_encrypt(col("text").cast("binary"), lit(pubA)).as("ct"))
    val dec = enc.select(col("doc_id"),
      F.age_decrypt(col("ct"), lit(privA)).cast("string").as("text"))
    assert(dec.as[Doc].collect().sortBy(_.doc_id).map(_.text).toSeq == Seq("alpha", "beta"))
  }

  test("typed Dataset[T] pipeline: encrypt into a case class and back") {
    import graft.sql.{functions => F}
    import spark.implicits._
    AgeFunctions.register(spark)
    val docs = Seq(Doc(1, "alpha"), Doc(2, "beta"), Doc(3, "gamma")).toDS()
    val secured: org.apache.spark.sql.Dataset[SecureDoc] = docs
      .select(col("doc_id"),
        F.age_encrypt_pass(col("text").cast("binary"), lit("pw")).as("ct"))
      .as[SecureDoc]
    // typed filter + map back through decryption
    val restored = secured.filter((d: SecureDoc) => d.doc_id <= 2)
      .select(col("doc_id"),
        F.age_decrypt_pass(col("ct"), lit("pw")).cast("string").as("text"))
      .as[Doc].collect().sortBy(_.doc_id)
    assert(restored.map(_.text).toSeq == Seq("alpha", "beta"))
  }

  test("multi-recipient, armor, keygen, version, cosine through the DSL") {
    import graft.sql.{functions => F}
    import spark.implicits._
    AgeFunctions.register(spark)
    val one = Seq(Doc(1, "payload")).toDS()
    val r = one.select(
      F.age_decrypt(
        F.age_encrypt_multi(col("text").cast("binary"), array(lit(pubA))),
        lit(privA)).cast("string").as("rt"),
      F.age_encrypt_armor(col("text").cast("binary"), lit(pubA)).as("armored"),
      F.age_keygen().getField("public_key").as("fresh_pub"),
      F.age_version().as("v"),
      F.cosine_sim(
        array(lit(1.0f), lit(0.0f)), array(lit(1.0f), lit(0.0f))).as("cos"))
      .collect()(0)
    assert(r.getAs[String]("rt") == "payload")
    assert(r.getAs[String]("armored").startsWith("-----BEGIN AGE ENCRYPTED FILE-----"))
    assert(r.getAs[String]("fresh_pub").startsWith("age1"))
    assert(r.getAs[String]("v").nonEmpty)
    assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-9)
  }
}

package graft.sql

import graft.core._
import graft.secrets.AgeSecretManager
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

/** The reference extension's six scalar functions as Spark UDFs, plus the
  * `age_try_decrypt` null-on-failure variant (our addition — SQL queries
  * cannot catch exceptions, so predicate-style tests over failure cases
  * need it) and the `age_secrets` listing view.
  *
  * Registration mirror of /root/reference/src/age_extension.cpp:439-476.
  * Nondeterminism flags per SURVEY.md §1.4.2: keygen/encrypt must NOT be
  * constant-folded or re-ordered by Catalyst (the reference never declares
  * this to DuckDB — a latent bug there; Spark lets us do it right).
  *
  * Secret-name resolution happens per row against an immutable snapshot of
  * the driver-side registry captured in the UDF closure; every secret
  * mutation re-registers the UDFs (AgeSecretManager.onChange), so executors
  * always receive a current snapshot with the task closure — the
  * distributed equivalent of the reference's per-row catalog lookup
  * (src/age_extension.cpp:229-256, 292-320).
  */
object AgeFunctions {
  final case class AgeKeyPairRow(public_key: String, private_key: String)

  type Secrets = Map[String, (Option[String], Option[String])]

  // ---- per-row kernels (serializable pure functions over the snapshot) ----

  /** src/age_extension.cpp:229-256 — non-"age1" strings resolve as secret
    * names; every lookup failure collapses to the same message the host
    * wrapper throws. */
  private def resolveRecipient(k: String, secrets: Secrets): Array[Byte] = {
    val resolved =
      if (k.startsWith("age1")) k
      else secrets.get(k).flatMap(_._1).getOrElse(
        throw new AgeInvalidInputException(
          s"Invalid age recipient key: $k (not a valid age key or secret name)"))
    AgeKeys.parseRecipient(resolved) match {
      case Right(pub) => pub
      case Left(_) => // rust/src/lib.rs:83
        throw new AgeInvalidInputException(s"Invalid age recipient key: $resolved")
    }
  }

  /** src/age_extension.cpp:292-320 + rust/src/lib.rs:199-212. */
  private def resolveIdentity(k: String, secrets: Secrets): Array[Byte] = {
    val resolved =
      if (k.startsWith("AGE-SECRET-KEY-1")) k
      else secrets.get(k).flatMap(_._2).getOrElse(
        throw new AgeInvalidInputException(
          s"Invalid age identity key: $k (not a valid age key or secret name)"))
    AgeKeys.parseIdentity(resolved) match {
      case Right(id) => id
      case Left(e) => // raw identity that fails bech32 → rust parse error path
        throw new AgeInvalidInputException(s"Decryption failed: invalid identity key ($e)")
    }
  }

  // NULL inputs yield NULL, mirroring the host executors' null-skipping
  // (src/age_extension.cpp:199, BinaryExecutor default null handling).
  private[graft] def encryptImpl(data: Array[Byte], recipient: String,
                                 secrets: Secrets): Array[Byte] =
    if (data == null || recipient == null) null
    else AgeFormat.encrypt(data, Seq(resolveRecipient(recipient, secrets)))

  private[graft] def decryptImpl(data: Array[Byte], identity: String,
                                 secrets: Secrets): Array[Byte] =
    if (data == null || identity == null) null
    else AgeFormat.decrypt(data, resolveIdentity(identity, secrets))

  /** src/age_extension.cpp:348-429 + rust/src/lib.rs:278-304. */
  private[graft] def encryptMultiImpl(data: Array[Byte], recipients: Seq[String],
                                      secrets: Secrets): Array[Byte] = {
    if (data == null) return null
    if (recipients == null || recipients.isEmpty)
      throw new AgeInvalidInputException("Recipients list cannot be empty")
    val resolved = recipients.map { k =>
      if (k.startsWith("age1")) k
      else secrets.get(k).flatMap(_._1).getOrElse(
        throw new AgeInvalidInputException(s"Invalid recipient: $k"))
    }
    val parsed = resolved.zipWithIndex.map { case (k, i) =>
      AgeKeys.parseRecipient(k) match {
        case Right(pub) => pub
        case Left(_) => // rust/src/lib.rs:285 (0-based position)
          throw new AgeInvalidInputException(s"Invalid recipient at position $i: $k")
      }
    }
    AgeFormat.encrypt(data, parsed)
  }

  /** Engine version string (reference: DuckDB::LibraryVersion(),
    * src/age_extension.cpp:432-437). */
  def versionString: String = s"graft-age 0.1.0 (Spark ${org.apache.spark.SPARK_VERSION})"

  // ---- registration ----

  private val sessions =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Long]()
  private val hookInstalled = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Register all functions + the `age_secrets` view on a session. Safe to
    * call repeatedly (idempotent; refreshes the secret snapshot). Calls are
    * O(1) no-ops while the secret registry is unchanged — query bodies call
    * this defensively, and re-binding 8 UDFs per execution is pure planner
    * overhead (it showed up as ~tens of ms in the bench loop). */
  def register(spark: SparkSession): Unit = synchronized {
    // version + snapshot are read INSIDE the lock: with concurrent queries
    // (parallel Verify) an unsynchronized register could read a pre-CREATE
    // snapshot, lose the CPU, and then overwrite the onChange hook's fresh
    // registration with stale secret bindings — age06's secret-name lookup
    // then fails at execution. Atomic read-check-register makes the last
    // writer's (version, snapshot) pair consistent.
    val version = AgeSecretManager.version
    if (sessions.get(spark) == version) return
    val secrets: Secrets = AgeSecretManager.snapshot

    spark.udf.register("age_keygen",
      udf(() => { val kp = AgeKeys.generate(); AgeKeyPairRow(kp.publicKey, kp.privateKey) })
        .asNondeterministic())

    spark.udf.register("age_keygen_from_seed",
      udf((seed: Array[Byte]) => {
        val kp = AgeKeys.fromSeed(seed); AgeKeyPairRow(kp.publicKey, kp.privateKey)
      }))

    spark.udf.register("age_encrypt",
      udf((data: Array[Byte], recipient: String) => encryptImpl(data, recipient, secrets))
        .asNondeterministic())

    spark.udf.register("age_encrypt_armor",
      udf((data: Array[Byte], recipient: String) =>
        if (data == null || recipient == null) null
        else AgeFormat.armor(encryptImpl(data, recipient, secrets)))
        .asNondeterministic())

    spark.udf.register("age_decrypt",
      udf((data: Array[Byte], identity: String) => decryptImpl(data, identity, secrets)))

    spark.udf.register("age_try_decrypt",
      udf((data: Array[Byte], identity: String) =>
        try decryptImpl(data, identity, secrets)
        catch { case _: AgeInvalidInputException => null }))

    spark.udf.register("age_encrypt_multi",
      udf((data: Array[Byte], recipients: Seq[String]) =>
        encryptMultiImpl(data, recipients, secrets)).asNondeterministic())

    // passphrase (scrypt stanza) surface — age spec coverage beyond the
    // reference's X25519-only recipients; decrypt auto-detects armor
    spark.udf.register("age_encrypt_pass",
      udf((data: Array[Byte], passphrase: String) =>
        if (data == null || passphrase == null) null
        else AgeFormat.encryptWithPassphrase(data, passphrase))
        .asNondeterministic())

    spark.udf.register("age_decrypt_pass",
      udf((data: Array[Byte], passphrase: String) =>
        if (data == null || passphrase == null) null
        else AgeFormat.decryptWithPassphrase(data, passphrase)))

    spark.udf.register("age_version", udf(() => versionString))

    refreshSecretsView(spark)

    sessions.put(spark, version)
    if (hookInstalled.compareAndSet(false, true))
      AgeSecretManager.onChange(() => refreshAll())
  }

  private def refreshSecretsView(spark: SparkSession): Unit = {
    import spark.implicits._
    AgeSecretManager.list.toDF("name", "type", "provider", "key_id")
      .createOrReplaceTempView("age_secrets")
  }

  private def refreshAll(): Unit =
    sessions.forEach { (s, _) =>
      if (s.sparkContext.isStopped) sessions.remove(s) // don't pin dead sessions
      else register(s)
    }
}

package graft.sql

import graft.core.AgeInvalidInputException
import graft.secrets.{AgeSecretManager, AgeSecretOptions}
import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** SQL DDL parity for the reference's secret surface (SURVEY.md §7 hard
  * part #2): `CREATE SECRET n (TYPE age, PUBLIC_KEY '…', …)` and
  * `DROP SECRET n` parse to custom `LeafRunnableCommand`s via a delegating
  * parser injected through `SparkSessionExtensions` — Spark has no secret
  * DDL, so this is the (c)-level custom-plan route: parser → logical
  * command → execution against the driver-side secret registry.
  *
  * Grammar mirrors /root/reference test/sql/age_secret.test:15-35 and
  * src/age_extension.cpp:144-162 (named params: public_key, private_key,
  * public_key_file, private_key_file, key_id; TYPE age required).
  */
/** A secret parameter value: a literal, or a scalar subquery evaluated at
  * command run time — the reference's documented key-rotation workflow is
  * `CREATE SECRET k (TYPE age, PUBLIC_KEY (SELECT (age_keygen()).public_key))`
  * (reference FUNCTIONS.md:414-419). */
sealed trait SecretParamValue
final case class LitParam(value: String) extends SecretParamValue
final case class SubqueryParam(sql: String) extends SecretParamValue

case class CreateAgeSecretCommand(name: String,
                                  params: Seq[(String, SecretParamValue)],
                                  replace: Boolean = false,
                                  ifNotExists: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", StringType, nullable = false)())

  private def resolve(spark: SparkSession, v: SecretParamValue): String = v match {
    case LitParam(s) => s
    case SubqueryParam(q) =>
      val rows = spark.sql(q).collect()
      if (rows.length != 1 || rows(0).length != 1)
        throw new AgeInvalidInputException(
          s"Secret parameter subquery must return exactly one value: ($q)")
      Option(rows(0).get(0)).map(_.toString).getOrElse(
        throw new AgeInvalidInputException(
          s"Secret parameter subquery returned NULL: ($q)"))
  }

  override def run(sparkSession: SparkSession): Seq[Row] = {
    var opts = AgeSecretOptions()
    params.foreach { case (key, raw) =>
      val v = resolve(sparkSession, raw)
      key match {
        case "PUBLIC_KEY"       => opts = opts.copy(publicKey = Some(v))
        case "PRIVATE_KEY"      => opts = opts.copy(privateKey = Some(v))
        case "PUBLIC_KEY_FILE"  => opts = opts.copy(publicKeyFile = Some(v))
        case "PRIVATE_KEY_FILE" => opts = opts.copy(privateKeyFile = Some(v))
        case "KEY_ID"           => opts = opts.copy(keyId = Some(v))
      }
    }
    AgeSecretManager.create(name, opts, replace = replace, ifNotExists = ifNotExists)
    Seq(Row(s"Secret '$name' created"))
  }
}

case class DropAgeSecretCommand(name: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", StringType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = {
    AgeSecretManager.drop(name)
    Seq(Row(s"Secret '$name' dropped"))
  }
}

object AgeDdlParser {
  // CREATE [OR REPLACE] SECRET [IF NOT EXISTS] name (...): same modifier
  // grammar as the host engine's secret DDL (DuckDB Secrets Manager docs)
  private val CreateRe =
    """(?is)\s*CREATE\s+(?:(OR\s+REPLACE)\s+)?SECRET\s+(?:(IF\s+NOT\s+EXISTS)\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*\((.*)\)\s*;?\s*""".r
  private val DropRe =
    """(?is)\s*DROP\s+SECRET\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*""".r

  private val knownParams = Set("PUBLIC_KEY", "PRIVATE_KEY",
    "PUBLIC_KEY_FILE", "PRIVATE_KEY_FILE", "KEY_ID")

  private def malformed(rest: String): Nothing =
    throw new AgeInvalidInputException(s"Malformed secret parameter: ${rest.trim}")

  /** Quote- and paren-aware parameter scan. Three value forms:
    * `'quoted'` (commas/spaces allowed inside), `bare_token`, and
    * `(SELECT …)` — a balanced-paren scalar subquery, kept verbatim for
    * run-time evaluation. */
  private def parseParams(body: String): Seq[(String, SecretParamValue)] = {
    val out = scala.collection.mutable.ListBuffer[(String, SecretParamValue)]()
    var i = 0
    def skipWs(): Unit = while (i < body.length && body(i).isWhitespace) i += 1
    while ({ skipWs(); i < body.length }) {
      val ks = i
      while (i < body.length && (body(i).isLetterOrDigit || body(i) == '_')) i += 1
      if (i == ks) malformed(body.substring(ks))
      val key = body.substring(ks, i)
      skipWs()
      val value: SecretParamValue =
        if (i < body.length && body(i) == '\'') {
          i += 1; val vs = i
          while (i < body.length && body(i) != '\'') i += 1
          if (i >= body.length) malformed(body.substring(ks))
          val v = body.substring(vs, i); i += 1
          LitParam(v)
        } else if (i < body.length && body(i) == '(') {
          val vs = i; var depth = 0; var inQuote = false
          while (i < body.length && (depth > 0 || i == vs)) {
            val c = body(i)
            if (inQuote) { if (c == '\'') inQuote = false }
            else if (c == '\'') inQuote = true
            else if (c == '(') depth += 1
            else if (c == ')') depth -= 1
            i += 1
          }
          if (depth != 0) malformed(body.substring(ks))
          SubqueryParam(body.substring(vs + 1, i - 1).trim)
        } else {
          val vs = i
          while (i < body.length && body(i) != ',' && !body(i).isWhitespace) i += 1
          if (i == vs) malformed(body.substring(ks))
          LitParam(body.substring(vs, i))
        }
      skipWs()
      if (i < body.length) {
        if (body(i) == ',') i += 1 else malformed(body.substring(i))
      }
      out += key -> value
    }
    out.toList
  }

  /** Returns a command plan iff the statement is age-secret DDL. */
  def parseSecretDdl(sqlText: String): Option[LogicalPlan] = sqlText match {
    case CreateRe(orReplace, ifNotExistsMod, name, body) =>
      if (orReplace != null && ifNotExistsMod != null)
        throw new AgeInvalidInputException(
          "Cannot combine OR REPLACE with IF NOT EXISTS")
      var secretType: Option[String] = None
      val params = scala.collection.mutable.ListBuffer[(String, SecretParamValue)]()
      parseParams(body).foreach { case (key, v) =>
        key.toUpperCase match {
          case "TYPE" => v match {
            case LitParam(t) => secretType = Some(t.toLowerCase)
            case SubqueryParam(_) =>
              throw new AgeInvalidInputException("Secret type must be 'age', got: <subquery>")
          }
          case k if knownParams.contains(k) => params += k -> v
          case other =>
            throw new AgeInvalidInputException(s"Unknown secret parameter: $other")
        }
      }
      if (!secretType.contains("age"))
        throw new AgeInvalidInputException(
          s"Secret type must be 'age', got: ${secretType.getOrElse("<none>")}")
      Some(CreateAgeSecretCommand(name, params.toList,
        replace = orReplace != null, ifNotExists = ifNotExistsMod != null))
    case DropRe(name) => Some(DropAgeSecretCommand(name))
    case _            => None
  }
}

/** Delegating parser: age-secret DDL handled here, everything else passes
  * through to the session's default parser. */
class AgeDdlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    AgeDdlParser.parseSecretDdl(sqlText).getOrElse(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Session extension point: `SparkSession.builder().withExtensions(new
  * GraftSparkExtensions)` (or spark.sql.extensions=graft.sql.GraftSparkExtensions)
  * turns on the secret DDL and the `age_secrets()` table function. Scalar
  * function registration stays explicit via AgeFunctions.register
  * (mirroring the reference's LOAD-time hook). */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{AttributeReference, ExpressionInfo}
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
  import org.apache.spark.unsafe.types.UTF8String

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectParser((_, delegate) => new AgeDdlParser(delegate))
    // COUNT(DISTINCT <integral>) → paged-bitmap aggregate: standard SQL
    // gets the no-Expand plan automatically (see the rule's scaladoc)
    extensions.injectOptimizerRule(_ => graft.plans.RewriteExactDistinctToBitmap)
    // whole-operator tier: logical TopKPerGroup → partial/final bounded-heap
    // physical pair (see graft.plans.TopKPerGroup scaladoc)
    extensions.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    // native expressions reachable from pure SQL (not just the Scala DSL)
    extensions.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.functions.CosineSim].getName, "cosine_sim",
        "cosine_sim(a, b) - codegen cosine similarity of two float/double arrays"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (args.length != 2)
          throw new graft.core.AgeInvalidInputException(
            "cosine_sim(a, b) takes exactly 2 arguments")
        graft.functions.CosineSim(args(0), args(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier("cosine_sim_pair"),
      new ExpressionInfo(classOf[graft.functions.CosineSimPair].getName, "cosine_sim_pair",
        "cosine_sim_pair(a, b, prefix_len) - struct(full, prefix) cosine from one " +
          "vector traversal; prefix_len must be an integer literal"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        if (args.length != 3)
          throw new graft.core.AgeInvalidInputException(
            "cosine_sim_pair(a, b, prefix_len) takes exactly 3 arguments")
        val p = args(2) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case _ => throw new graft.core.AgeInvalidInputException(
            "cosine_sim_pair: prefix_len must be an integer literal")
        }
        graft.functions.CosineSimPair(args.head, args(1), p)
      }))
    extensions.injectFunction((
      FunctionIdentifier("token_stats"),
      new ExpressionInfo(classOf[graft.functions.TokenStats].getName, "token_stats",
        "token_stats(text) - [n_tokens, n_subwords, n_chars] per row, split-on-space semantics"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (args.length != 1)
          throw new graft.core.AgeInvalidInputException(
            "token_stats(text) takes exactly 1 argument")
        graft.functions.TokenStats(args.head)
      }))
    extensions.injectFunction((
      FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[graft.functions.RepetitionStats].getName, "repetition_stats",
        "repetition_stats(text) - [top2gram_count, n_2grams, top3gram_count, " +
          "n_3grams] per row, split-on-space word-gram semantics"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (args.length != 1)
          throw new graft.core.AgeInvalidInputException(
            "repetition_stats(text) takes exactly 1 argument")
        graft.functions.RepetitionStats(args.head)
      }))
    extensions.injectFunction((
      FunctionIdentifier("band_keys"),
      new ExpressionInfo(classOf[graft.functions.BandKeys].getName, "band_keys",
        "band_keys(vec, n_planes, band_size) - LSH band keys of a float/double " +
          "array; n_planes and band_size must be integer literals"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                   what: String): Int = e match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case _ => throw new graft.core.AgeInvalidInputException(
            s"band_keys: $what must be an integer literal")
        }
        if (args.length != 3)
          throw new graft.core.AgeInvalidInputException(
            "band_keys(vec, n_planes, band_size) takes exactly 3 arguments")
        graft.functions.BandKeys(args.head,
          intLit(args(1), "n_planes"), intLit(args(2), "band_size"))
      }))
    extensions.injectFunction((
      FunctionIdentifier("substring_run_fps"),
      new ExpressionInfo(classOf[graft.functions.SubstringRunFps].getName,
        "substring_run_fps",
        "substring_run_fps(text, w) - md5 hex fingerprint per w-token " +
          "window (array index = window start token), one zero-copy byte " +
          "pass; w must be an integer literal"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        if (args.length != 2)
          throw new graft.core.AgeInvalidInputException(
            "substring_run_fps(text, w) takes exactly 2 arguments")
        val w = args(1) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case _ => throw new graft.core.AgeInvalidInputException(
            "substring_run_fps: w must be an integer literal")
        }
        if (w < 1) throw new graft.core.AgeInvalidInputException(
          "substring_run_fps: w must be >= 1")
        graft.functions.SubstringRunFps(args.head, w)
      }))
    extensions.injectFunction((
      FunctionIdentifier("audio_fp"),
      new ExpressionInfo(classOf[graft.functions.AudioFp].getName,
        "audio_fp",
        "audio_fp(pcm, frame_samples, n_frames, threshold) - packed-bits " +
          "LONG fingerprint of a 16-bit LE PCM binary payload (bit f set " +
          "iff frame f's integer energy exceeds threshold), one byte " +
          "pass; the three parameters must be integer literals"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        if (args.length != 4)
          throw new graft.core.AgeInvalidInputException(
            "audio_fp(pcm, frame_samples, n_frames, threshold) takes exactly 4 arguments")
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                   what: String): Int = e match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case _ => throw new graft.core.AgeInvalidInputException(
            s"audio_fp: $what must be an integer literal")
        }
        val thr = args(3) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v.toLong
          case Literal(v: Long, org.apache.spark.sql.types.LongType) => v
          case _ => throw new graft.core.AgeInvalidInputException(
            "audio_fp: threshold must be an integer literal")
        }
        graft.functions.AudioFp(args.head,
          intLit(args(1), "frame_samples"), intLit(args(2), "n_frames"), thr)
      }))
    extensions.injectFunction((
      FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[graft.functions.CdcChunks].getName,
        "cdc_chunks",
        "cdc_chunks(text, mod) - content-defined-chunking ledger " +
          "array<struct<chunk, fp, n_chars>> per document (h28-mod " +
          "boundary words end their chunk), one byte pass; mod must be " +
          "an integer literal"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        if (args.length != 2)
          throw new graft.core.AgeInvalidInputException(
            "cdc_chunks(text, mod) takes exactly 2 arguments")
        val m = args(1) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case _ => throw new graft.core.AgeInvalidInputException(
            "cdc_chunks: mod must be an integer literal")
        }
        if (m < 1) throw new graft.core.AgeInvalidInputException(
          "cdc_chunks: mod must be >= 1")
        graft.functions.CdcChunks(args.head, m)
      }))
    extensions.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "minhash_sig",
        "minhash_sig(text) - one-pass K=8 MinHash signature of the document's " +
          "3-word shingle set (null when the document has fewer than 3 words)"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (args.length != 1)
          throw new graft.core.AgeInvalidInputException(
            "minhash_sig(text) takes exactly 1 argument")
        graft.functions.MinHashSig(args.head)
      }))
    // custom aggregates from pure SQL: the analyzer wraps a returned
    // AggregateFunction in a Complete AggregateExpression itself
    extensions.injectFunction((
      FunctionIdentifier("minhash_agg"),
      new ExpressionInfo(classOf[graft.functions.MinHashAgg].getName, "minhash_agg",
        "minhash_agg(hash) - K-permutation MinHash signature of a group of 28-bit hashes"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (args.length != 1)
          throw new graft.core.AgeInvalidInputException(
            "minhash_agg(hash) takes exactly 1 argument")
        graft.functions.MinHashAgg(args.head)
      }))
    extensions.injectFunction((
      FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(classOf[graft.functions.SimHashAgg].getName, "simhash_agg",
        "simhash_agg(h1, h2) - 56-bit SimHash of a group of paired 28-bit word hashes"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (args.length != 2)
          throw new graft.core.AgeInvalidInputException(
            "simhash_agg(h1, h2) takes exactly 2 arguments")
        graft.functions.SimHashAgg(args.head, args(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier("cms_agg"),
      new ExpressionInfo(classOf[graft.functions.CmsAgg].getName, "cms_agg",
        "cms_agg(hash) - 4x256 Count-Min-Sketch counter grid over 28-bit item hashes"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (args.length != 1)
          throw new graft.core.AgeInvalidInputException(
            "cms_agg(hash) takes exactly 1 argument")
        graft.functions.CmsAgg(args.head)
      }))
    extensions.injectFunction((
      FunctionIdentifier("sum128_agg"),
      new ExpressionInfo(classOf[graft.functions.Sum128Agg].getName, "sum128_agg",
        "sum128_agg(x) - exact 128-bit integer SUM of a BIGINT column, emitted as decimal digits"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (args.length != 1)
          throw new graft.core.AgeInvalidInputException(
            "sum128_agg(x) takes exactly 1 argument")
        graft.functions.Sum128Agg(args.head)
      }))
    extensions.injectFunction((
      FunctionIdentifier("bitmap_distinct"),
      new ExpressionInfo(classOf[graft.functions.BitmapDistinct].getName, "bitmap_distinct",
        "bitmap_distinct(c) - exact COUNT(DISTINCT) of an integral/date column via paged bitmaps"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (args.length != 1)
          throw new graft.core.AgeInvalidInputException(
            "bitmap_distinct(c) takes exactly 1 argument")
        graft.functions.BitmapDistinct(args.head)
      }))
    extensions.injectFunction((
      FunctionIdentifier("topk_agg"),
      new ExpressionInfo(classOf[graft.functions.TopKAgg].getName, "topk_agg",
        "topk_agg(score, id, k) - bounded-heap top-k (score desc, id asc); k must be an integer literal"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        if (args.length != 3)
          throw new graft.core.AgeInvalidInputException(
            "topk_agg(score, id, k) takes exactly 3 arguments")
        val k = args(2) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case _ => throw new graft.core.AgeInvalidInputException(
            "topk_agg: k must be an integer literal")
        }
        graft.functions.TopKAgg(args.head, args(1), k)
      }))
    // `SELECT * FROM age_secrets()` — catalog-level table-valued function,
    // the closer `duckdb_secrets()` parity (reference FUNCTIONS.md secret
    // listing; the temp view registered by AgeFunctions remains for
    // back-compat). The builder runs at analysis time, so each query sees
    // the registry as of its own planning — same read-time semantics as
    // the reference's transient secret catalog.
    extensions.injectTableFunction((
      FunctionIdentifier("age_secrets"),
      new ExpressionInfo(classOf[GraftSparkExtensions].getName, "age_secrets",
        "age_secrets() - lists registered age secrets (name, type, provider, key_id)"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (args.nonEmpty)
          throw new graft.core.AgeInvalidInputException(
            "age_secrets() takes no arguments")
        val output = Seq("name", "type", "provider", "key_id")
          .map(f => AttributeReference(f, org.apache.spark.sql.types.StringType,
            nullable = false)())
        val rows = graft.secrets.AgeSecretManager.list.map { case (n, t, p, k) =>
          InternalRow(UTF8String.fromString(n), UTF8String.fromString(t),
            UTF8String.fromString(p), UTF8String.fromString(k))
        }
        LocalRelation(output, rows)
      }))
  }
}

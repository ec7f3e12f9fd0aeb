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
case class CreateAgeSecretCommand(name: String, opts: AgeSecretOptions)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", StringType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] = {
    AgeSecretManager.create(name, opts)
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
  private val CreateRe =
    """(?is)\s*CREATE\s+SECRET\s+([A-Za-z_][A-Za-z0-9_]*)\s*\((.*)\)\s*;?\s*""".r
  private val DropRe =
    """(?is)\s*DROP\s+SECRET\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*""".r
  // progressive, quote-aware scan: commas inside quoted values must not
  // split parameters (e.g. PUBLIC_KEY_FILE '/tmp/my,dir/key.txt')
  private val ParamRe =
    """(?is)\s*([A-Za-z_]+)\s+(?:'([^']*)'|([A-Za-z0-9_./-]+))\s*(?:,|$)""".r

  /** Returns a command plan iff the statement is age-secret DDL. */
  def parseSecretDdl(sqlText: String): Option[LogicalPlan] = sqlText match {
    case CreateRe(name, body) =>
      var secretType: Option[String] = None
      var opts = AgeSecretOptions()
      var pos = 0
      while (pos < body.length && body.substring(pos).trim.nonEmpty) {
        ParamRe.findPrefixMatchOf(body.substring(pos)) match {
          case Some(m) =>
            val key = m.group(1)
            val v = if (m.group(2) != null) m.group(2) else m.group(3)
            key.toUpperCase match {
              case "TYPE"             => secretType = Some(v.toLowerCase)
              case "PUBLIC_KEY"       => opts = opts.copy(publicKey = Some(v))
              case "PRIVATE_KEY"      => opts = opts.copy(privateKey = Some(v))
              case "PUBLIC_KEY_FILE"  => opts = opts.copy(publicKeyFile = Some(v))
              case "PRIVATE_KEY_FILE" => opts = opts.copy(privateKeyFile = Some(v))
              case "KEY_ID"           => opts = opts.copy(keyId = Some(v))
              case other =>
                throw new AgeInvalidInputException(s"Unknown secret parameter: $other")
            }
            pos += m.end
          case None =>
            throw new AgeInvalidInputException(
              s"Malformed secret parameter: ${body.substring(pos).trim}")
        }
      }
      if (!secretType.contains("age"))
        throw new AgeInvalidInputException(
          s"Secret type must be 'age', got: ${secretType.getOrElse("<none>")}")
      Some(CreateAgeSecretCommand(name, opts))
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
  * turns on the secret DDL. Function registration stays explicit via
  * AgeFunctions.register (mirroring the reference's LOAD-time hook). */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    extensions.injectParser((_, delegate) => new AgeDdlParser(delegate))
}

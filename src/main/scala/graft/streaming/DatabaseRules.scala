package graft.streaming

import graft.core.{PartitionTemplate, TemplatePart}

/** Per-database configuration — the reference's `DatabaseRules`
  * (data_types/src/database_rules.rs:38-59: name, partition template,
  * lifecycle rules, optional write-buffer connection, shard routing
  * config; only the cleanup-sleep knob has no analog here). The
  * management surface stores one of these per database and the
  * write/lifecycle paths read their knobs from it.
  *
  * Names follow the reference's `DatabaseName` invariant
  * (database_name.rs:7,55-75): 1..=64 characters, no control characters.
  *
  * The JSON codec is hand-rolled (this build links no JSON library):
  * flat, order-insensitive fields with defaults for everything but
  * `name`, e.g.
  * {{{
  * {"name":"mydb",
  *  "partition_template":[{"part":"table"},{"part":"column","name":"region"},
  *                        {"part":"time","format":"%Y-%m-%d"}],
  *  "lifecycle":{"late_arrive_window_ms":300000,"persist_row_threshold":1000000,
  *               "persist_age_threshold_ms":1800000,"persist":true,
  *               "buffer_size_soft":10000000,"buffer_size_hard":20000000,
  *               "drop_non_persisted":false,"retention_ns":86400000000000},
  *  "write_buffer":"file:/buffers/mydb",
  *  "shard_config":{"specific_targets":[{"regex":"^system\\.","shard":0}],
  *                  "hash_ring":{"include_table":true,"columns":["host"],
  *                               "shards":[1,2,3]}}}
  * }}}
  */
final case class DatabaseRules(
    name: String,
    partitionTemplate: PartitionTemplate = DatabaseRules.DefaultTemplate,
    lifecycle: Lifecycle.Rules = Lifecycle.Rules(),
    writeBufferConnection: Option[String] = None,
    /** Routing (database_rules.rs:49-51 RoutingRules / ShardConfig):
      * specific table-regex targets win over the hash ring. */
    shardConfig: Option[graft.core.Sharding.ShardConfig] = None)

object DatabaseRules {

  /** The reference's default template (database_rules.rs:233 example). */
  val DefaultTemplate: PartitionTemplate =
    PartitionTemplate(Seq(TemplatePart.TimeFormat("%Y-%m-%d")))

  /** DatabaseName::new validation (database_name.rs:55-75). */
  def validateName(name: String): Either[String, String] =
    if (name.isEmpty || name.length > 64)
      Left(s"database name '$name' length must be between 1 and 64 characters")
    else name.zipWithIndex.collectFirst { case (c, i) if c.isControl => i } match {
      case Some(i) => Left(s"database name '$name' contains invalid character. " +
        s"Character number $i is a control which is not allowed.")
      case None => Right(name)
    }

  // ---------------------------------------------------------------- json

  private def jStr(s: String): String = graft.core.Json.str(s)

  def toJson(r: DatabaseRules): String = {
    val parts = r.partitionTemplate.parts.map {
      case TemplatePart.Table => """{"part":"table"}"""
      case TemplatePart.ColumnValue(n) => s"""{"part":"column","name":${jStr(n)}}"""
      case TemplatePart.TimeFormat(f) => s"""{"part":"time","format":${jStr(f)}}"""
    }.mkString("[", ",", "]")
    val lc = r.lifecycle
    val lcJson = Seq(
      s""""late_arrive_window_ms":${lc.lateArriveWindowMs}""",
      s""""persist_row_threshold":${lc.persistRowThreshold}""",
      s""""persist_age_threshold_ms":${lc.persistAgeThresholdMs}""",
      s""""persist":${lc.persist}""",
      s""""drop_non_persisted":${lc.dropNonPersisted}""") ++
      lc.bufferSizeSoft.map(v => s""""buffer_size_soft":$v""") ++
      lc.bufferSizeHard.map(v => s""""buffer_size_hard":$v""") ++
      lc.retentionNs.map(v => s""""retention_ns":$v""")
    val shardJson = r.shardConfig.map { sc =>
      val targets = sc.specificTargets.map { case (m, shard) =>
        s"""{"regex":${jStr(m.tableRegex)},"shard":$shard}"""
      }.mkString("[", ",", "]")
      val ring = sc.hashRing.map { h =>
        s""""hash_ring":{"include_table":${h.includeTable},""" +
          s""""columns":${h.columns.map(jStr).mkString("[", ",", "]")},""" +
          s""""shards":${h.shards.mkString("[", ",", "]")}}"""
      }
      (Seq(s""""specific_targets":$targets""") ++ ring).mkString("{", ",", "}")
    }
    (Seq(s""""name":${jStr(r.name)}""",
      s""""partition_template":$parts""",
      s""""lifecycle":${lcJson.mkString("{", ",", "}")}""") ++
      r.writeBufferConnection.map(c => s""""write_buffer":${jStr(c)}""") ++
      shardJson.map(s => s""""shard_config":$s"""))
      .mkString("{", ",", "}")
  }

  private val strField = graft.core.Json.strField _
  private val longField = graft.core.Json.longField _
  private val boolField = graft.core.Json.boolField _

  /** Parse rules JSON; absent fields fall back to defaults (the
    * reference's serde defaults). Unknown template part kinds and name
    * violations are errors, not silent drops. Field order is free: the
    * partition_template block is excised before the top-level scalar
    * fields are read, so a template column part named "name" or
    * "write_buffer" cannot shadow them. */
  def fromJson(json: String): Either[String, DatabaseRules] = {
    val templateSpan = graft.core.Json.blockField(json, "partition_template", '[', ']')
    // top-level scalars are read from the document WITHOUT the template
    // array (whose parts have their own "name"/"format" keys)
    val top = templateSpan match {
      case Some((_, s, e)) => json.substring(0, s) + json.substring(e)
      case None => json
    }
    val name = strField(top, "name") match {
      case None => return Left("""missing "name"""")
      case Some(n) => validateName(n) match {
        case Left(e) => return Left(e)
        case Right(v) => v
      }
    }
    // quote-aware object iteration throughout: '}' or ']' inside quoted
    // values (regex quantifiers, time formats) cannot truncate elements
    val template: Either[String, PartitionTemplate] =
      graft.core.Json.objArrayField(json, "partition_template") match {
        case Nil => Right(DefaultTemplate)
        case objs =>
          val parts = objs.map { o =>
            strField(o, "part") match {
              case Some("table") => Right(TemplatePart.Table)
              case Some("column") => strField(o, "name")
                .toRight("column part missing \"name\"").map(TemplatePart.ColumnValue)
              case Some("time") => strField(o, "format")
                .toRight("time part missing \"format\"").map(TemplatePart.TimeFormat)
              case other => Left(s"unknown template part: $other")
            }
          }
          parts.collectFirst { case Left(e) => e } match {
            case Some(e) => Left(e)
            case None => Right(PartitionTemplate(parts.collect { case Right(p) => p }))
          }
      }
    template.flatMap { tpl =>
      val lcJson = graft.core.Json.blockField(top, "lifecycle", '{', '}')
        .map(_._1).getOrElse("")
      val d = Lifecycle.Rules()
      val lc = Lifecycle.Rules(
        lateArriveWindowMs = longField(lcJson, "late_arrive_window_ms")
          .getOrElse(d.lateArriveWindowMs),
        persistRowThreshold = longField(lcJson, "persist_row_threshold")
          .getOrElse(d.persistRowThreshold),
        persistAgeThresholdMs = longField(lcJson, "persist_age_threshold_ms")
          .getOrElse(d.persistAgeThresholdMs),
        bufferSizeSoft = longField(lcJson, "buffer_size_soft"),
        bufferSizeHard = longField(lcJson, "buffer_size_hard"),
        persist = boolField(lcJson, "persist").getOrElse(d.persist),
        dropNonPersisted = boolField(lcJson, "drop_non_persisted")
          .getOrElse(d.dropNonPersisted),
        retentionNs = longField(lcJson, "retention_ns"))
      val shardCfg: Either[String, Option[graft.core.Sharding.ShardConfig]] =
        graft.core.Json.blockField(top, "shard_config", '{', '}') match {
          case None => Right(scala.None)
          case Some((sc, _, _)) =>
            // malformed routing elements are ERRORS — a silently dropped
            // target would misroute writes with no diagnostic
            def shardId(v: Long): Either[String, Int] =
              if (v < 0 || v > Int.MaxValue) Left(s"shard id out of range: $v")
              else Right(v.toInt)
            val targets = graft.core.Json.objArrayField(sc, "specific_targets")
              .map { o =>
                (strField(o, "regex"), longField(o, "shard")) match {
                  case (Some(re), Some(sh)) =>
                    shardId(sh).map(s => (graft.core.Sharding.Matcher(re), s))
                  case _ => Left(s"specific_target needs \"regex\" and \"shard\": $o")
                }
              }
            targets.collectFirst { case Left(e) => e } match {
              case Some(e) => Left(e)
              case None =>
                val ringE: Either[String, Option[graft.core.Sharding.HashRing]] =
                  graft.core.Json.blockField(sc, "hash_ring", '{', '}')
                    .map(_._1) match {
                    case scala.None => Right(scala.None)
                    case Some(h) =>
                      val shardsE = graft.core.Json.longArrayField(h, "shards")
                        .map(shardId)
                      shardsE.collectFirst { case Left(e) => e } match {
                        case Some(e) => Left(e)
                        case None =>
                          val shards = shardsE.collect { case Right(s) => s }
                          if (shards.isEmpty) Left("hash_ring needs a non-empty \"shards\" array")
                          else Right(Some(graft.core.Sharding.HashRing(
                            boolField(h, "include_table").getOrElse(false),
                            graft.core.Json.strArrayField(h, "columns"),
                            shards.toIndexedSeq)))
                      }
                  }
                ringE.map(ring => Some(graft.core.Sharding.ShardConfig(
                  targets.collect { case Right(t) => t }, ring)))
            }
        }
      shardCfg.map(sc =>
        DatabaseRules(name, tpl, lc, strField(top, "write_buffer"), sc))
    }
  }
}

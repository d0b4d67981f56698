package graft.sources

import java.nio.charset.StandardCharsets
import java.util.concurrent.TimeUnit
import org.sparkproject.connect.grpc.{
  CallOptions, Channel, ClientInterceptors, ManagedChannel, ManagedChannelBuilder, Metadata
}
import org.sparkproject.connect.grpc.inprocess.InProcessChannelBuilder
import org.sparkproject.connect.grpc.stub.{ClientCalls, MetadataUtils}

/** Channel construction + per-call decoration shared by the VStream
  * feeder and the metadata SQL client (reference newChannel(),
  * VitessReplicationConnection.java:374-385: keepalive, max inbound
  * message size, load-balancing policy; headers ride a client
  * interceptor and credentials a CallCredentials, :112-127). */
private[sources] object GrpcChannels {

  def build(cfg: GrpcConfig): ManagedChannel =
    if (cfg.target.startsWith("inprocess:"))
      InProcessChannelBuilder.forName(cfg.target.stripPrefix("inprocess:")).build()
    else {
      // parse at the LAST ':' so IPv6 literals work ([::1]:15991); a
      // portless or non-numeric target is a config error that says so
      // (not a MatchError that never names the option)
      val i = cfg.target.lastIndexOf(':')
      if (i <= 0 || i == cfg.target.length - 1)
        throw new IllegalArgumentException(
          s"vtgate.target must be host:port, got '${cfg.target}'")
      val host = cfg.target.substring(0, i).stripPrefix("[").stripSuffix("]")
      val port =
        try cfg.target.substring(i + 1).toInt
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"vtgate.target port must be numeric, got '${cfg.target}'")
        }
      val b = ManagedChannelBuilder.forAddress(host, port).usePlaintext()
      cfg.loadBalancingPolicy.foreach(b.defaultLoadBalancingPolicy)
      cfg.maxInboundMessageSize.foreach(b.maxInboundMessageSize)
      cfg.keepaliveMs.foreach(ms => b.keepAliveTime(ms, TimeUnit.MILLISECONDS))
      b.build()
    }

  /** Attach the configured static headers (reference grpc.headers). */
  def decorated(channel: ManagedChannel, cfg: GrpcConfig): Channel =
    if (cfg.headers.isEmpty) channel
    else {
      val md = new Metadata()
      cfg.headers.foreach { case (k, v) =>
        md.put(Metadata.Key.of(k, Metadata.ASCII_STRING_MARSHALLER), v)
      }
      ClientInterceptors.intercept(channel, MetadataUtils.newAttachHeadersInterceptor(md))
    }

  /** Static username/password credentials (reference StaticAuthCredentials). */
  def callOptions(cfg: GrpcConfig): CallOptions = (cfg.username, cfg.password) match {
    case (Some(u), Some(p)) => CallOptions.DEFAULT.withCallCredentials(new VtGrpc.StaticAuth(u, p))
    case _ => CallOptions.DEFAULT
  }
}

/** Driver-side vtgate SQL client over the unary Execute RPC — the
  * metadata round-trip the reference runs through
  * VitessReplicationConnection.execute (java:71-95). One channel per
  * client; metadata calls are rare (startup topology discovery), so the
  * reference likewise opens a fresh connection per query batch. */
private[sources] final class VtgateSql(cfg: GrpcConfig) extends AutoCloseable {

  private val channel = GrpcChannels.build(cfg)
  // pure functions of the fixed cfg — built once, not per statement
  private val decoratedChannel = GrpcChannels.decorated(channel, cfg)
  private val callOptions = GrpcChannels.callOptions(cfg)

  /** Run one statement via vtgate default routing. */
  def execute(sql: String): VtWire.QueryResultModel = exec(sql, None)

  /** Run one statement against a specific shard: target
    * `keyspace:shard@tablet_type`, autocommit on (reference
    * execute(sql, shard), VitessReplicationConnection.java:82-95). */
  def execute(sql: String, shard: String): VtWire.QueryResultModel = exec(sql, Some(shard))

  private def exec(sql: String, shard: Option[String]): VtWire.QueryResultModel = {
    val req = VtWire.ExecuteRequestModel(
      sql,
      targetString = shard.map(sh => s"${cfg.keyspace}:$sh@${cfg.tabletType}").getOrElse(""),
      autocommit = shard.isDefined)
    val respBytes = ClientCalls.blockingUnaryCall(
      decoratedChannel.newCall(VtGrpc.ExecuteMethod, callOptions),
      VtWire.encodeExecuteRequest(req))
    val resp = VtWire.decodeExecuteResponse(respBytes)
    resp.error.foreach(msg =>
      throw new IllegalStateException(s"vtgate Execute failed for [$sql]: $msg"))
    resp.result.getOrElse(VtWire.QueryResultModel(Nil, Nil))
  }

  override def close(): Unit = {
    channel.shutdownNow()
    channel.awaitTermination(5, TimeUnit.SECONDS)
    ()
  }
}

/** S6 metadata scans over a live vtgate — SHOW VITESS_SHARDS /
  * VITESS_TABLETS / TABLES / DATABASES, with the reference's query
  * forms, escaping, and row parsing (VitessMetadata.java:64-234). The
  * feed-file analogues live in [[Metadata]]; this is the same surface
  * served by the Execute RPC instead of staged FIELD lines. */
private[sources] object GrpcMetadata {

  /** The reference tags metadata queries with a vitess workload-name
    * comment so they are attributable server-side (VitessMetadata.java:36). */
  private val Workload = "/*vt+ WORKLOAD_NAME=graft */ "

  /** MySQL single-quoted string-literal escape (reference :49-53). */
  def escapeStringLiteral(v: String): String =
    v.replace("\\", "\\\\").replace("'", "\\'")

  /** LIKE-wildcard escape, applied BEFORE the literal escape so the
    * added backslashes are themselves doubled (reference :55-62). */
  def escapeLikePattern(v: String): String =
    v.replace("\\", "\\\\").replace("_", "\\_").replace("%", "\\%")

  /** QueryResult rows as per-column strings; NULL → None (reference
    * parseRows, :176-198 — the same packed lengths/values slicing the
    * engine's D3 expression does distributively). */
  def rows(r: VtWire.QueryResultModel): Seq[Seq[Option[String]]] =
    r.rows.map(_.slice.map(_.map(new String(_, StandardCharsets.UTF_8))))

  /** Each row's values concatenated (reference flattenAndConcat, :217-222). */
  def flattened(r: VtWire.QueryResultModel): Seq[String] =
    rows(r).map(_.flatten.mkString)

  /** SHOW VITESS_SHARDS LIKE 'ks/%' → shard names (reference
    * getVitessShards, :114-125: rows are `keyspace/shard`). */
  def shards(sql: VtgateSql, keyspace: String): Seq[String] = {
    val like = escapeStringLiteral(escapeLikePattern(keyspace))
    flattened(sql.execute(s"${Workload}SHOW VITESS_SHARDS LIKE '$like/%'")).map { row =>
      val parts = row.split("/")
      require(parts.length == 2, s"wrong SHOW VITESS_SHARDS field format: $row")
      parts(1)
    }
  }

  /** SHOW VITESS_TABLETS → shards of this keyspace that have ANY
    * tablet row (reference getVitessShardsFromTablets +
    * getNonEmptyShards, :127-134, :201-215: col 1 = keyspace, col 2 =
    * shard — the reference deliberately does NOT filter on the tablet
    * state column, so a NOT_SERVING tablet still marks its shard
    * non-empty; parity kept here). */
  def nonEmptyShards(sql: VtgateSql, keyspace: String): Seq[String] =
    rows(sql.execute(s"${Workload}SHOW VITESS_TABLETS"))
      .collect { case row if row.size >= 3 && row(1).contains(keyspace) => row(2) }
      .flatten.distinct.sorted

  /** SHOW TABLES of the keyspace (reference getTables, :77-108): with
    * `excludeEmptyShards` the query targets one non-empty shard (the
    * reference picks a random one; first-sorted here for determinism —
    * any serving shard returns the same list), otherwise plain
    * `SHOW TABLES FROM keyspace` via default routing. */
  def tables(
      sql: VtgateSql,
      keyspace: String,
      excludeEmptyShards: Boolean,
      configuredShards: Seq[String]): Seq[String] = {
    def quote(id: String) = "`" + id.replace("`", "``") + "`"
    val result =
      if (excludeEmptyShards) {
        val candidates =
          if (configuredShards.nonEmpty) configuredShards.sorted
          else nonEmptyShards(sql, keyspace)
        require(candidates.nonEmpty, s"no non-empty shard to query tables from in $keyspace")
        sql.execute(s"${Workload}SHOW TABLES", candidates.head)
      } else sql.execute(s"${Workload}SHOW TABLES FROM ${quote(keyspace)}")
    flattened(result)
  }

  /** SHOW DATABASES (reference getDatabases, :228-234). */
  def databases(sql: VtgateSql): Seq[String] =
    flattened(sql.execute(s"${Workload}SHOW DATABASES;"))
}

package graft.core

import org.apache.spark.sql.DataFrame

/** Control-plane security for the engine facades (SURVEY.md §2.1 R1/R8).
  *
  * The reference token-gates every RPC and authorizes subscriptions
  * before creating them:
  *  - the internal emitter compares a metadata token against its
  *    configured internal token — missing header → unauthenticated,
  *    mismatch → "bad token" (internal_event_server.rs:23-45);
  *  - the public server extracts the caller token and issues an
  *    `authorize(resource, Read, resource_id)` RPC before subscribing —
  *    not-ok → permission denied (public_event_server.rs:56-100), and
  *    repeats the check when a bidi session attaches to an existing
  *    group (public_event_server.rs:249-301);
  *  - the reference's test authz service approves every request
  *    (storage_endpoint_mock.rs:100-111) — [[AuthzProvider.AllowAll]].
  *
  * Spark mapping per SURVEY §2.1 R8: the authorize RPC becomes a lookup
  * against a `resources`-style GRANTS DIMENSION. The dimension is tiny
  * (tokens × resources a deployment manages, not data rows), so it is
  * collected once to a driver-side set: authorization is a per-call
  * control-plane check — O(RPCs), never a per-event data-plane
  * predicate — which is exactly why it stays off the 100 TB hot path.
  */
object ResourceAction {
  val Read = "READ"
  val Write = "WRITE"
}

/** Missing credential (reference: tonic unauthenticated status). */
final class UnauthenticatedException(msg: String) extends RuntimeException(msg)

/** Bad token / failed authorize lookup (reference: PermissionDenied). */
final class PermissionDeniedException(msg: String) extends RuntimeException(msg)

/** The authorize RPC of public_event_server.rs:74-100 as a pure lookup. */
trait AuthzProvider {
  def authorize(token: String, resourceType: ResourceType, resourceId: String,
                action: String): Boolean
}

object AuthzProvider {

  /** The reference's mock authz service: always approves
    * (storage_endpoint_mock.rs:100-111). A token must still be
    * PRESENT — the reference errors on a missing header before it ever
    * reaches authz. */
  case object AllowAll extends AuthzProvider {
    override def authorize(token: String, resourceType: ResourceType,
                           resourceId: String, action: String): Boolean = true
  }

  /** Grants resolved from a `resources` dimension of
    * (token, resource_type, resource_id, action) rows.
    * `resource_type = "ALL"` and/or `resource_id = "*"` act as
    * wildcards, so one row can express a project-admin token. */
  final class GrantTable(grants: Set[(String, String, String, String)])
      extends AuthzProvider {
    override def authorize(token: String, resourceType: ResourceType,
                           resourceId: String, action: String): Boolean =
      grants((token, resourceType.name, resourceId, action)) ||
        grants((token, ResourceType.All.name, resourceId, action)) ||
        grants((token, resourceType.name, "*", action)) ||
        grants((token, ResourceType.All.name, "*", action))
  }

  def fromGrants(rows: Iterable[(String, String, String, String)]): AuthzProvider =
    new GrantTable(rows.toSet)

  /** Build from a grants dimension DataFrame with columns
    * (token, resource_type, resource_id, action). Collected once —
    * see the class scaladoc for why that is the scale-correct shape. */
  def fromGrants(df: DataFrame): AuthzProvider =
    new GrantTable(df.select("token", "resource_type", "resource_id", "action")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet)
}

/** Security posture of an engine facade.
  *
  *  - `internalToken`: when set, [[requireInternal]] gates the emit
  *    path exactly like internal_event_server.rs:23-45; `None` leaves
  *    ingest open (in-process/test wiring).
  *  - `authz`: when set, [[requireRead]] gates subscribe/attach like
  *    public_event_server.rs:56-100; `None` disables the public gate.
  *    `Some(AllowAll)` reproduces the reference's e2e wiring: any
  *    token passes, but a MISSING token is still rejected.
  */
final case class EngineSecurity(internalToken: Option[String] = None,
                                authz: Option[AuthzProvider] = None) {

  /** R1 emit gate (internal_event_server.rs:23-45). */
  def requireInternal(token: Option[String]): Unit = internalToken.foreach { expected =>
    val t = token.getOrElse(throw new UnauthenticatedException(
      "authentication header required and was not found"))
    if (t != expected) throw new PermissionDeniedException("bad token")
  }

  /** R8 subscribe/attach gate (public_event_server.rs:56-100,249-301). */
  def requireRead(token: Option[String], resourceType: ResourceType,
                  resourceId: String): Unit = authz.foreach { provider =>
    val t = token.getOrElse(throw new UnauthenticatedException(
      "authentication header required and was not found"))
    if (!provider.authorize(t, resourceType, resourceId, ResourceAction.Read))
      throw new PermissionDeniedException("insufficient permissions")
  }
}

object EngineSecurity {
  /** No gates — in-process embedding and the existing test wiring. */
  val Permissive: EngineSecurity = EngineSecurity()
}

package graft.core

import org.apache.spark.sql.SparkSession

/** Resolves the acting principal for the authorizer. The default engine
  * posture is session-asserted identity (`spark.sql.graft.principal` —
  * a library has no authentication layer, documented in
  * [[Catalog.authorize]]); deployments that DO have one (Kerberos, a
  * gateway token, cloud IAM) bind it here so a session can no longer
  * assert an arbitrary principal. The reference derives the principal
  * from the authenticated RPC channel server-side
  * (fluss-server authorizer/) — this SPI is the library-engine seam for
  * the same binding.
  */
trait IdentityProvider {
  /** The authenticated principal for this session (e.g. "User:alice"). */
  def principal(spark: SparkSession): String
}

object Identity {

  /** Dynamic-config key naming an [[IdentityProvider]] class. Server-side
    * scope (DYNAMIC > DEFAULT, session ignored) — an admin persists it
    * with `sys.set_cluster_configs` and no session can route around it.
    */
  val ProviderKey = "spark.sql.graft.identity.provider"

  // embedder-installed provider (programmatic alternative to the config)
  @volatile private var installed: Option[IdentityProvider] = None
  private val byClass =
    new java.util.concurrent.ConcurrentHashMap[String, IdentityProvider]()

  def install(p: IdentityProvider): Unit = installed = Some(p)
  def uninstall(): Unit = installed = None

  /** The authenticated principal, when a provider is bound: the
    * warehouse-persisted provider class wins, then the
    * embedder-installed one; None means session-asserted identity.
    */
  def resolve(spark: SparkSession, warehouse: String): Option[String] = {
    val cls = DynamicConfigs.effectiveServerSide(warehouse, ProviderKey, "")
    val provider =
      if (cls.nonEmpty)
        Some(byClass.computeIfAbsent(cls, c => {
          // context classloader first: provider jars shipped via --jars
          // live in Spark's session classloader, not necessarily the one
          // that loaded this class
          val loader = Option(Thread.currentThread().getContextClassLoader)
            .getOrElse(getClass.getClassLoader)
          Class.forName(c, true, loader).getDeclaredConstructor()
            .newInstance().asInstanceOf[IdentityProvider]
        }))
      else installed
    provider.map(_.principal(spark))
  }
}

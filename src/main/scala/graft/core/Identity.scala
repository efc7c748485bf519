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

  /** Drop cached provider instances. Call after swapping a provider jar
    * (new session classloader) if the class NAME stayed the same — the
    * cache also keys on the loader, so this is only needed when the same
    * loader should re-instantiate (e.g. a provider with refreshed
    * construction-time state).
    */
  def clearCache(): Unit = byClass.clear()

  /** The authenticated principal, when a provider is bound: the
    * warehouse-persisted provider class wins, then the
    * embedder-installed one; None means session-asserted identity.
    */
  def resolve(spark: SparkSession, warehouse: String): Option[String] = {
    val cls = DynamicConfigs.effectiveServerSide(warehouse, ProviderKey, "")
    val provider =
      if (cls.nonEmpty) {
        // context classloader first: provider jars shipped via --jars
        // live in Spark's session classloader, not necessarily the one
        // that loaded this class. The cache keys on (class, loader) so a
        // provider-jar update that swaps the session classloader gets a
        // fresh instance instead of the stale one cached under the old
        // jar ([[clearCache]] covers same-loader re-instantiation).
        val loader = Option(Thread.currentThread().getContextClassLoader)
          .getOrElse(getClass.getClassLoader)
        val key = cls + "@" + Integer.toHexString(
          System.identityHashCode(loader))
        Some(byClass.computeIfAbsent(key, _ =>
          Class.forName(cls, true, loader).getDeclaredConstructor()
            .newInstance().asInstanceOf[IdentityProvider]))
      } else installed
    provider.map(_.principal(spark))
  }
}

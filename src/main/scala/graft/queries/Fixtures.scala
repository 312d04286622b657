package graft.queries

/** Root for the Verify/Bench harness's shared fixture tables (carbonish
  * loads of the driver parquet, ANN centroid/codebook caches, IUD
  * pristine copies). Harness-only — nothing under `graft.engine.*`
  * reads this.
  *
  * The directory is scoped per OS user under the JVM's tmpdir (r12:
  * a fixed `/tmp/graft_tables` was shared across users, so another
  * account's stale or corrupt fixture could shadow ours and a
  * multi-user box would race on rebuilds). Fixtures persist across
  * JVMs by design — Verify and Bench run separately and share the
  * build — and every consumer treats a corrupt/partial fixture as
  * absent and rebuilds it. Override with GRAFT_FIXTURE_DIR.
  */
object Fixtures {
  val root: String = sys.env.getOrElse(
    "GRAFT_FIXTURE_DIR",
    s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_tables-${System.getProperty("user.name", "anon")}")
}

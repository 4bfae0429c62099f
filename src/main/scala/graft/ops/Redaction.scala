package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Identifier redaction — the PII-scrubbing pass every shareable dataset
  * (and every training corpus) runs before leaving the trust boundary:
  * detect value patterns with anchored regexes, mask the sensitive span
  * keeping only a short verification suffix, and report per-group
  * detection counts so the scrub is auditable.
  *
  * The fixture's honest PII surface is the customer identity block
  * (`c_name` is the `Customer#NNNNNNNNN` account identifier; the
  * synthetic documents text carries no emails/phones, so pretending to
  * scrub it would test nothing). Patterns stay RE2-safe (no
  * lookarounds/backrefs) — Spark compiles java.util.regex and DuckDB
  * compiles RE2, and the oracle contract needs both engines to agree on
  * every match.
  *
  * Scale shape: masking is a per-row codegen'd `regexp_replace` (map-only,
  * stays inside WholeStageCodegen, no shuffle of its own); auditing is one
  * conditional aggregation over one scan ([[Validation]]'s pattern)
  * regardless of rule count.
  */
object Redaction {

  /** Full-match detector for the customer account-identifier layout. */
  val CustomerIdPattern = "^Customer#[0-9]{9}$"

  /** Mask an account identifier keeping the trailing 4 digits visible:
    * `Customer#000001234` → `Customer#*****1234`. The mask pattern is the
    * FULL-id detector with a suffix capture — not a bare prefix match — so
    * masking and detection agree by construction: a malformed value like
    * `Customer#12345xyz` is neither detected nor masked (a prefix-only
    * pattern would mask it while counting it undetected, skewing the
    * audit's masked extremes against its detection count). Anchored single
    * match — deterministic in both regex engines. */
  def maskCustomerId(name: Column): Column =
    regexp_replace(name, "^Customer#[0-9]{5}([0-9]{4})$", "Customer#*****$1")

  /** Per-segment redaction audit over the customer identity block: every
    * row's identifier masked, detection counted, and the masked extremes
    * reported as the per-group audit sample. One scan, one shuffle (the
    * groupBy), masking map-side. */
  def customerIdRedactionAudit(customer: DataFrame): DataFrame =
    customer
      .select(col("c_mktsegment"),
        col("c_name").rlike(CustomerIdPattern).as("__hit"),
        maskCustomerId(col("c_name")).as("__masked"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("n_id_detected"),
        min(col("__masked")).as("min_masked"),
        max(col("__masked")).as("max_masked"))
      .orderBy("c_mktsegment")
}

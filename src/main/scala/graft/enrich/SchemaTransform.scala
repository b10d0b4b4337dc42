package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-version translation — the schema processor
  * (`processor/schemaprocessor/transformer.go`, README "Targets
  * Schemas" in `/root/reference`): telemetry published under one
  * schema-family version is converted to a target version by composing
  * the per-version `rename_attributes` sections of the family's schema
  * file, forward for an upgrade and inverted for a downgrade.
  *
  * Spark-first rendering: a revision list (ascending versions, each
  * carrying its attribute renames), applied to a frame as column
  * renames plus `transform_keys` over map-typed attribute columns —
  * pure projections, no shuffle, fully codegen'd.
  */
object SchemaTransform {

  /** One schema-file revision: what changed AT this version (the
    * renames that upgrade FROM the previous version TO this one). */
  final case class Revision(version: String,
                            renameAttributes: Map[String, String] = Map.empty)

  /** Ordered schema family (ascending versions). */
  final case class Family(name: String, revisions: Seq[Revision]) {
    require(revisions.sliding(2).forall {
      case Seq(a, b) => cmp(a.version, b.version) < 0
      case _ => true
    }, "revisions must be in strictly ascending version order")
  }

  /** Numeric-tuple version ordering ("1.10.0" > "1.9.0"). */
  def versionKey(v: String): Seq[Int] = {
    val parts = v.split("\\.").toSeq.map(_.toInt)
    parts.padTo(3, 0)
  }

  private def cmp(a: String, b: String): Int = {
    import scala.math.Ordering.Implicits._
    implicitly[Ordering[Seq[Int]]].compare(versionKey(a), versionKey(b))
  }

  /** The rename chain from `fromVersion` to `toVersion`, one entry PER
    * REVISION (ordered): forward renames of every revision in (from, to]
    * for an upgrade, inverted renames of (to, from] in reverse order for
    * a downgrade.
    *
    * The per-revision grouping is load-bearing: within ONE revision the
    * renames are a SIMULTANEOUS mapping (a schema file's
    * rename_attributes is a map — {a→b, b→c} renames a to b, never a to
    * c, and {a→b, b→a} is a swap), while ACROSS revisions renames
    * compose sequentially (r1's a→b then r2's b→c legitimately carries
    * a to c). A flattened fold cannot distinguish the two — the
    * round-4 review found it cascading within a revision (and crashing
    * transform_keys with DUPLICATED_MAP_KEY on the swap case). */
  def renameChain(family: Family, fromVersion: String, toVersion: String): Seq[Seq[(String, String)]] = {
    if (cmp(fromVersion, toVersion) == 0) Nil
    else if (cmp(fromVersion, toVersion) < 0)
      family.revisions
        .filter(r => cmp(r.version, fromVersion) > 0 && cmp(r.version, toVersion) <= 0)
        .map(_.renameAttributes.toSeq)
    else
      family.revisions
        .filter(r => cmp(r.version, toVersion) > 0 && cmp(r.version, fromVersion) <= 0)
        .reverse
        .map(_.renameAttributes.toSeq.map(_.swap))
  }

  /** Translate a frame whose attributes are TOP-LEVEL COLUMNS: each
    * revision is one simultaneous select-with-aliases projection. */
  def translate(df: DataFrame, family: Family,
                fromVersion: String, toVersion: String): DataFrame =
    renameChain(family, fromVersion, toVersion).foldLeft(df) { (acc, rev) =>
      val mapping = rev.toMap
      acc.select(acc.columns.map { c =>
        mapping.get(c).map(to => col(c).as(to)).getOrElse(col(c))
      }.toIndexedSeq: _*)
    }

  /** Translate a map-typed attributes COLUMN (one `transform_keys`
    * pass; revisions compose, entries within a revision do not). */
  def translateAttrs(attrs: Column, family: Family,
                     fromVersion: String, toVersion: String): Column = {
    val chain = renameChain(family, fromVersion, toVersion)
    if (chain.isEmpty) attrs
    else transform_keys(attrs, (k, _) =>
      chain.foldLeft(k) { (cur, rev) =>
        // `cur` = the key as of the START of this revision: each
        // revision is one simultaneous map lookup; revisions compose
        graft.functions.Ottl.simultaneousRemap(cur, rev)
      })
  }
}

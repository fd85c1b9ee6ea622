package graft.lake

/** Serializable zonemap / value-set probe descriptors, compiled ON THE
  * DRIVER from a parsed predicate (literals pre-coerced and pre-rendered)
  * and evaluated ON EXECUTORS against raw fragment JSON — the distributed
  * half of fragment pruning (SCALE.md: past ~10⁷ fragments the driver's
  * probe loop itself becomes the wall; the JSONL chunk layout was chosen
  * so executors can scan it directly).
  *
  * Semantics mirror [[LakeDataset.pruneFragments]]'s `mayMatch` exactly,
  * with two deliberate conservative gaps (both KEEP fragments, never drop):
  * bloom sidecar probes stay on the driver (file IO per fragment — the
  * caller re-checks survivors), and legacy session-timezone timestamp
  * stats skip the second-truncated lexical refinement. */
private[lake] sealed trait StatProbe extends Serializable

/** IS NULL (`wantNull`) / IS NOT NULL probe. */
private[lake] final case class NullProbe(fieldId: String, wantNull: Boolean)
  extends StatProbe

/** One comparison against the zonemap range. `op` ∈ gt, ge, lt, le.
  * `lit` is the driver-rendered comparison value; `numeric` fields (and
  * epoch-micros timestamps, `ts`) compare as BigDecimal / Long, others
  * lexically. */
private[lake] final case class RangeProbe(fieldId: String, op: String,
    lit: String, numeric: Boolean, ts: Boolean) extends StatProbe

/** Equality / IN probe: keep iff ANY value may be contained — each value
  * checks the zonemap range AND (when the fragment carries a complete
  * value set for the field) set membership. `vsLit` is the value rendered
  * exactly as the value-set build rendered column values; None = unknown
  * (keep). */
private[lake] final case class EqProbe(fieldId: String,
    values: Seq[(String, Option[String])], numeric: Boolean, ts: Boolean)
  extends StatProbe

private[lake] object StatProbes {

  private val epochMicrosRe = "-?\\d+".r

  /** stat-vs-literal compare: Some(sign) or None = unknown (conservative). */
  private def cmp(stat: String, lit: String, numeric: Boolean,
      ts: Boolean): Option[Int] =
    if (ts) {
      if (epochMicrosRe.matches(stat))
        Some(java.lang.Long.compare(stat.toLong, lit.toLong))
      else None // legacy tz-string stat: unknown, keep
    } else if (numeric) {
      try Some(BigDecimal(stat).compare(BigDecimal(lit)))
      catch { case _: NumberFormatException => None }
    } else Some(stat.compareTo(lit))

  /** Evaluate all probes against one fragment — true = may match (keep). */
  def mayMatch(frag: Fragment, probes: Seq[StatProbe]): Boolean =
    probes.forall {
      case NullProbe(fid, wantNull) =>
        frag.stats.get(fid).forall { s =>
          if (wantNull) s.nullCount > 0
          else frag.rowCount == 0 || s.nullCount < frag.rowCount
        }
      case RangeProbe(fid, op, lit, numeric, ts) =>
        frag.stats.get(fid).forall { s =>
          val bound = op match {
            case "gt" | "ge" => s.max
            case _ => s.min
          }
          (for { b <- bound; c <- cmp(b, lit, numeric, ts) } yield op match {
            case "gt" => c > 0
            case "ge" => c >= 0
            case "lt" => c < 0
            case "le" => c <= 0
          }).getOrElse(true)
        }
      case EqProbe(fid, values, numeric, ts) =>
        values.exists { case (lit, vsLit) =>
          frag.stats.get(fid).forall(s => (for {
            mn <- s.min; mx <- s.max
            c1 <- cmp(mn, lit, numeric, ts)
            c2 <- cmp(mx, lit, numeric, ts)
          } yield c1 <= 0 && c2 >= 0).getOrElse(true)) &&
            frag.valueSets.get(fid).forall { set =>
              vsLit match {
                case Some(v) =>
                  if (ts && !set.forall(epochMicrosRe.matches)) true
                  else set.contains(v)
                case None => true
              }
            }
        }
    }
}

package graft.oracle

import scala.collection.mutable
import graft.gen.Synthetic
import graft.url.UrlCanon
import graft.util.Hashing
import graft.extract.ExtractKernel

/** Straight-line single-threaded reference scheduler (SURVEY.md §5 item 3):
  * the executable spec of the engine's crawl semantics, mirroring the
  * reference's sequential drain (carrefour_extract_data.py:216: frontier file
  * order, one URL at a time, seen-set gate) generalized with the engine's
  * politeness budget and priority key. The Spark engine must reproduce this
  * oracle's (round, crawl_order, url) sequence and final seen set EXACTLY at
  * every parallelism level.
  */
object CrawlOracle {

  final case class Entry(
      category: String, url: String, urlNorm: String, urlHash: Long,
      host: String, depth: Int, hostRank: Int, discoveredSeq: Long, attempt: Int)

  final case class Scheduled(round: Int, crawlOrder: Long, urlNorm: String)

  def entryFor(seq: Long): Option[Entry] = {
    val id = if (seq % 11 == 10) seq - 1 else seq
    val processed = (Synthetic.mix2(id, 19) & 7) == 0 && seq % 11 != 10
    val raw = Synthetic.url(id, "en")
    val norm = UrlCanon.canonicalize(raw)
    if (processed) None
    else Some(Entry(Synthetic.category(id), raw, norm, Hashing.xxhash64(norm),
      UrlCanon.hostOf(norm), UrlCanon.depthOf(norm), Synthetic.hostIdx(id), seq, 0))
  }

  def preSeenHashes(n: Long): Set[Long] =
    (0L until n).flatMap { seq =>
      val id = if (seq % 11 == 10) seq - 1 else seq
      val processed = (Synthetic.mix2(id, 19) & 7) == 0 && seq % 11 != 10
      if (processed) Some(Hashing.xxhash64(UrlCanon.canonicalize(Synthetic.url(id, "en"))))
      else None
    }.toSet

  /** Page-existence predicate for the synthetic web: a page exists for every
    * generated product URL (en canonical key). */
  def pageExists(urlNorm: String, maxId: Long): Boolean = {
    // canonical EN url shape: https://shopK.example.com/mafegy/en/item-X-ID/p/ID
    val m = "/p/(\\d+)$".r.findFirstMatchIn(urlNorm)
    m.exists { mm =>
      val id = mm.group(1).toLong
      id < maxId && UrlCanon.canonicalize(Synthetic.url(id, "en")) == urlNorm
    }
  }

  /** Links harvested from page id's EN page that the engine keeps
    * (href != N/A && startsWith http). */
  def harvestedLinks(id: Long): Seq[String] = {
    val f = ExtractKernel.extractAll(Synthetic.pageHtml(id, "en"), "en")
    f.links.filter(h => h != "N/A" && h.startsWith("http"))
  }

  /** Run the oracle crawl over a frontier of n entries against a page corpus
    * of pagesN ids (pagesN < n leaves misses to exercise retry/quarantine;
    * harvested links to other hosts miss too). Returns
    * (schedule, finalSeenHashes, quarantined urls). */
  def run(
      n: Long,
      pagesN: Long,
      perHostBudget: Int,
      maxAttempts: Int = 5,
      maxRounds: Int = 100): (Vector[Scheduled], Set[Long], Set[String]) = {

    var frontier: Vector[Entry] =
      (0L until n).flatMap(entryFor).toVector
    val seen = mutable.Set.empty[Long] ++= preSeenHashes(n)
    val schedule = Vector.newBuilder[Scheduled]
    val quarantined = mutable.Set.empty[String]
    var round = 0

    while (frontier.nonEmpty && round < maxRounds) {
      round += 1
      // A1: first-wins dedup by url_hash (discovery order)
      val byHash = mutable.LinkedHashMap.empty[Long, Entry]
      frontier.sortBy(_.discoveredSeq).foreach { e =>
        if (!byHash.contains(e.urlHash)) byHash(e.urlHash) = e
      }
      // J4: seen gate
      val unseen = byHash.values.filter(e => !seen.contains(e.urlHash)).toVector
      // O2: per-host budget by priority order
      val prioritized = unseen.sortBy(e => (e.hostRank, e.depth, e.discoveredSeq, e.urlHash))
      val hostCount = mutable.Map.empty[String, Int].withDefaultValue(0)
      val (now, deferred) = prioritized.partition { e =>
        val c = hostCount(e.host)
        if (c < perHostBudget) { hostCount(e.host) = c + 1; true } else false
      }
      if (now.isEmpty) return (schedule.result(), seen.toSet, quarantined.toSet)
      // O1: global crawl order
      now.zipWithIndex.foreach { case (e, i) =>
        schedule += Scheduled(round, i.toLong, e.urlNorm)
      }
      // fetch + harvest + retry
      val nextFrontier = Vector.newBuilder[Entry]
      deferred.foreach(nextFrontier += _)
      val harvested = Vector.newBuilder[Entry]
      now.zipWithIndex.foreach { case (e, i) =>
        if (pageExists(e.urlNorm, pagesN)) {
          seen += e.urlHash
          val id = "/p/(\\d+)$".r.findFirstMatchIn(e.urlNorm).get.group(1).toLong
          harvestedLinks(id).zipWithIndex.foreach { case (href, li) =>
            val norm = UrlCanon.canonicalize(href)
            val h = Hashing.xxhash64(norm)
            harvested += Entry(e.category, href, norm, h, UrlCanon.hostOf(norm),
              UrlCanon.depthOf(norm), round,
              i.toLong * graft.app.CrawlEngine.LinkSeqMultiplier + li +
                round.toLong * graft.app.CrawlEngine.RoundSeqBase, 0)
          }
        } else if (e.attempt + 1 < maxAttempts) {
          nextFrontier += e.copy(attempt = e.attempt + 1)
        } else {
          quarantined += e.urlNorm
        }
      }
      // new links minus just-fetched
      harvested.result().foreach { e =>
        if (!seen.contains(e.urlHash)) nextFrontier += e
      }
      frontier = nextFrontier.result()
    }
    (schedule.result(), seen.toSet, quarantined.toSet)
  }
}

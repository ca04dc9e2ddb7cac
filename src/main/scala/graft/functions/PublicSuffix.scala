package graft.functions

/** A checked-in snapshot of the Mozilla Public Suffix List
  * (publicsuffix.org) in the PSL's own rule syntax: plain rules
  * ("co.uk"), wildcard rules ("*.ck" — `*` matches exactly one host
  * label), and exception rules ("!www.ck" — overrides a wildcard; the
  * public suffix is the exception rule minus its leftmost label).
  *
  * This is a SUBSET snapshot (the live list is ~9k rules and this
  * container has no network): the major ccTLD second-level registries
  * plus every wildcard-only TLD family and its exceptions, which is
  * the full shape of the real list — the complete PSL drops into
  * `Rules` unchanged and everything downstream (the grouped sets
  * below, the Url.registrableDomain when-chain, the generated DuckDB
  * IN-lists) scales with it: membership tests compile to Catalyst
  * `InSet` (hash lookup, delivered to executors as a broadcast
  * literal — no join, no shuffle, O(1) per row regardless of list
  * size).
  *
  * Matching semantics implemented (publicsuffix.org/list/ algorithm):
  * exception rules win over all others; otherwise the matching rule
  * with the most labels prevails; the default rule is `*` (the bare
  * TLD). The registrable domain is the public suffix plus one more
  * host label; a host that IS a public suffix degrades to itself
  * (bounded, never null — the grouping ops key on it).
  */
object PublicSuffix {

  val Rules: Seq[String] = Seq(
    // ---- wildcard-only TLD families (real PSL entries) ----
    "*.bd", "*.ck", "*.er", "*.jm", "*.kh", "*.mm", "*.np", "*.pg",
    "!www.ck",
    // ---- wildcard second-level families + city exceptions (jp) ----
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
    // ---- multi-part registries (subset of the real list) ----
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "org.uk",
    "plc.uk", "sch.uk",
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "iwi.nz",
    "maori.nz", "net.nz", "org.nz", "school.nz",
    "co.in", "firm.in", "gen.in", "ind.in", "net.in", "org.in",
    "ac.za", "co.za", "edu.za", "gov.za", "net.za", "org.za", "web.za",
    "com.br", "edu.br", "gov.br", "net.br", "org.br",
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "net.cn", "org.cn",
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "net.ar", "org.ar",
    "av.tr", "bel.tr", "com.tr", "edu.tr", "gov.tr", "net.tr", "org.tr",
    "co.kr", "go.kr", "ne.kr", "or.kr", "re.kr",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg",
    "com.hk", "edu.hk", "gov.hk", "net.hk", "org.hk",
    "com.tw", "edu.tw", "gov.tw", "net.tw", "org.tw",
    "ac.th", "co.th", "go.th", "in.th", "net.th", "or.th",
    "com.my", "edu.my", "gov.my", "net.my", "org.my",
    "com.ph", "edu.ph", "gov.ph", "net.ph", "org.ph",
    "com.vn", "edu.vn", "gov.vn", "net.vn", "org.vn",
    "com.eg", "edu.eg", "gov.eg", "net.eg", "org.eg",
    "ac.il", "co.il", "gov.il", "muni.il", "net.il", "org.il",
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa",
    "com.pk", "edu.pk", "gov.pk", "net.pk", "org.pk",
    "co.ke", "go.ke", "info.ke", "me.ke", "ne.ke", "or.ke", "sc.ke",
    "com.ng", "edu.ng", "gov.ng", "net.ng", "org.ng",
    "com.gh", "edu.gh", "gov.gh", "org.gh",
    // ---- 3-label plain registries (real PSL entries) ----
    "act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au", "sa.edu.au",
    "tas.edu.au", "vic.edu.au", "wa.edu.au")

  private def labelCount(r: String): Int = r.count(_ == '.') + 1

  /** Exception rules, grouped by label count: k → set of full rule
    * strings (the `!` stripped). A host whose last k labels equal an
    * entry has registrable domain = those k labels. */
  val ExceptionsByK: Map[Int, Set[String]] = Rules
    .filter(_.startsWith("!")).map(_.substring(1))
    .groupBy(labelCount).map { case (k, rs) => k -> rs.toSet }

  /** Wildcard rules, grouped by TOTAL label count (the `*` counts):
    * k → set of tails (rule minus the `*.`). A host with ≥ k labels
    * whose last k-1 labels equal a tail has a k-label public suffix. */
  val WildcardTailsByK: Map[Int, Set[String]] = Rules
    .filter(_.startsWith("*.")).map(_.substring(2))
    .groupBy(t => labelCount(t) + 1).map { case (k, rs) => k -> rs.toSet }

  /** Plain rules grouped by label count: k → set of suffixes. */
  val PlainByK: Map[Int, Set[String]] = Rules
    .filterNot(r => r.startsWith("!") || r.startsWith("*."))
    .groupBy(labelCount).map { case (k, rs) => k -> rs.toSet }

  /** Largest label count across all rules (bounds the when-chain and
    * the lastK expressions — 3 in this snapshot, 5 for the full PSL). */
  val MaxK: Int =
    (ExceptionsByK.keys ++ WildcardTailsByK.keys ++ PlainByK.keys).max
}

package graft.functions

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Registrable domain (eTLD+1) under the FULL Mozilla Public Suffix
  * List, as a codegen'd Catalyst expression.
  *
  * The PSL (publicsuffix.org, MPL-2.0; vendored at
  * `graft/public_suffix_list.dat`, ~14k rules) is the only correct way
  * to group crawl hosts by owning party: naive "last two labels" merges
  * every `.com.cn` / `.co.il` / `.github.io` tenant into one bucket,
  * which silently corrupts per-domain caps, domain mixing weights, and
  * URL dedup on real crawls. The official algorithm: find all rules
  * matching a suffix of the host (exact, `*.` wildcard, `!` exception);
  * the prevailing rule is the exception if one matches, else the match
  * with the most labels, else `*` (the bare TLD); the registrable
  * domain is the public suffix plus one more label.
  *
  * Deviation from the spec, shared with the DuckDB oracle: a host that
  * IS a public suffix (`co.uk`, `foo.ck` under `*.ck`) has no
  * registrable domain per spec; we return the host unchanged so
  * downstream caps/joins never see null and never merge two such hosts.
  *
  * Why a custom expression rather than a join against a rules table:
  * the lookup is O(#labels) hash probes per row against a ~14k-entry
  * static set — shipping it as three HashSets inside the generated code
  * keeps the whole URL-hygiene pipeline a zero-shuffle scan, where the
  * relational encoding (explode suffixes + broadcast join + argmin)
  * would add an exchange and an aggregate per query. At 1000 executors
  * the sets load once per JVM from the classpath, not per task.
  */
object PublicSuffix {
  /** eTLD+1 of a (lower-case) host column, full-PSL semantics. */
  def registrableDomain(host: Column): Column =
    Bridge.column(RegistrableDomainExpr(Bridge.expression(host)))
}

case class RegistrableDomainExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"registrable_domain requires string, got ${other.sql}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "registrable_domain"

  override protected def nullSafeEval(input: Any): Any =
    RegistrableDomainExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RegistrableDomainExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegistrableDomainExpr {

  /** Parsed PSL: exact rules, wildcard bases (`*.ck` stored as `ck`),
    * exception rules (`!www.ck` stored as `www.ck`). Loaded once per
    * JVM from the vendored resource; if the resource is missing (a
    * repackaged jar), falls back to the high-traffic two-level suffixes
    * so the expression degrades to the old approximation instead of
    * failing. */
  private val (exactRules, wildcardBases, exceptionRules):
      (java.util.HashSet[String], java.util.HashSet[String], java.util.HashSet[String]) = {
    val exact = new java.util.HashSet[String](32768)
    val wild = new java.util.HashSet[String](64)
    val exc = new java.util.HashSet[String](16)
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    if (in == null) {
      // fallback: the approximate list the engine shipped before the PSL
      for (s <- Seq("co", "com", "net", "org", "ac", "gov", "or", "edu", "gen", "ne");
           t <- Seq("uk", "au", "jp", "br", "in", "nz", "za", "kr", "mx", "id"))
        exact.add(s + "." + t)
    } else {
      val r = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      try {
        var line = r.readLine()
        while (line != null) {
          // spec: a rule is the line up to the first whitespace; '//' comments
          val t = line.trim
          if (t.nonEmpty && !t.startsWith("//")) {
            val rule = t.takeWhile(ch => !Character.isWhitespace(ch))
            if (rule.startsWith("!")) exc.add(rule.substring(1))
            else if (rule.startsWith("*.")) wild.add(rule.substring(2))
            else exact.add(rule)
          }
          line = r.readLine()
        }
      } finally r.close()
    }
    (exact, wild, exc)
  }

  /** Shared by interpreted eval and generated code. Input is expected
    * lower-case (Url.host lowers it); lowered defensively here so a
    * direct caller cannot miss a rule on case. */
  def compute(h: UTF8String): UTF8String = {
    // Locale.ROOT: under a Turkish default locale 'I' would lower to
    // dotless 'ı' and silently stop matching PSL rules
    val host = h.toString.toLowerCase(java.util.Locale.ROOT)
    if (host.isEmpty) return h
    val labels = host.split('.')
    val n = labels.length
    // smallest index (longest suffix) at which each rule class matches
    var excI = -1
    var matI = -1
    var i = 0
    var sfx: String = null
    while (i < n) {
      sfx = if (sfx == null) labels.slice(i, n).mkString(".") else sfx
      if (excI < 0 && exceptionRules.contains(sfx)) excI = i
      if (matI < 0 && exactRules.contains(sfx)) matI = i
      val tail = if (i + 1 < n) labels.slice(i + 1, n).mkString(".") else null
      if (matI < 0 && tail != null && wildcardBases.contains(tail)) matI = i
      sfx = tail
      i += 1
    }
    // exception rule prevails: its own index IS the registrable domain;
    // else one label above the longest matching rule; no rule -> '*'
    // (bare TLD is the public suffix, last two labels registrable).
    val regI =
      if (excI >= 0) excI
      else math.max(0, (if (matI >= 0) matI else n - 1) - 1)
    if (regI == 0) UTF8String.fromString(host)
    else UTF8String.fromString(labels.slice(regI, n).mkString("."))
  }
}

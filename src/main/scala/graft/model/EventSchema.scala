package graft.model

import org.apache.spark.sql.types._

/** One parameter of an event declaration. */
final case class EventParam(name: String, solType: String, indexed: Boolean) {
  /** Canonical Solidity type for signature hashing (`uint` → `uint256`,
    * `uint[]` → `uint256[]`).
    */
  def canonicalType: String = solType match {
    case "uint"   => "uint256"
    case "int"    => "int256"
    case "fixed"  => "fixed128x18"
    case "ufixed" => "ufixed128x18"
    case t if t.endsWith("[]") =>
      EventParam(name, t.dropRight(2), indexed).canonicalType + "[]"
    case t if t.startsWith("(") && t.endsWith(")") =>
      // tuple: canonicalize each component, strip component names
      EventSchema.tupleOf(t).fold(t)(_.map { case (ct, _) =>
        EventParam(name, ct, indexed).canonicalType
      }.mkString("(", ",", ")"))
    case t if t.endsWith("]") =>
      val open = t.lastIndexOf('[')
      EventParam(name, t.substring(0, open), indexed).canonicalType +
        t.substring(open)
    case other  => other
  }
}

/** Runtime replacement for the reference's compile-time schema DSL.
  *
  * The reference parses `Name(type [indexed] name, …) [anonymous]` with nom
  * combinators inside a proc-macro (reference: eth_event_macro/src/events.rs:13-115)
  * and code-generates a typed struct. Here the same grammar is parsed at
  * runtime and yields a Spark `StructType` plus the keccak-256 `topic0`
  * (reference: ethabi's `Event::signature()`, used at
  * eth_event_stream/src/stream.rs:113).
  *
  * Grammar rules kept from the reference:
  *  - a leading `event` keyword is rejected (eth_event_macro/src/events.rs:16-18)
  *  - trailing garbage after the declaration is rejected (events.rs:81-86)
  *  - `indexed` may follow the type; `anonymous` may follow the param list
  *  - accepted types: `address | uint | uint256 | bool` (events.rs:103-108);
  *    this engine additionally accepts the full `uint8..uint256`/`int*`,
  *    `bytes32`, and `string` — a superset, decode stays nullable-on-mismatch
  *    instead of the reference's panic (eth_event_macro/src/lib.rs:134).
  */
final case class EventSchema(
    name: String,
    params: Seq[EventParam],
    anonymous: Boolean) {

  /** Canonical signature string, e.g. `Transfer(address,address,uint256)`. */
  def signature: String = s"$name(${params.map(_.canonicalType).mkString(",")})"

  /** keccak-256 of the canonical signature = topic0. */
  def topic0: Array[Byte] = Keccak256.hash(signature)

  def topic0Hex: String = "0x" + Hex.encode(topic0)

  def indexedParams: Seq[EventParam] = params.filter(_.indexed)
  def dataParams: Seq[EventParam] = params.filterNot(_.indexed)

  /** Spark type for one Solidity type (SURVEY §1.5 mapping):
    * address/bytes32 → Binary, uintN/intN → Decimal(38,0), bool → Boolean,
    * string → String, `T[]` → Array of T's mapping.
    */
  def sparkType(solType: String): DataType = EventSchema.sparkTypeOf(solType)

  /** Decoded-payload struct, params in declaration order — mirrors the
    * macro's `data: (T1,…,Tn)` tuple (eth_event_macro/src/lib.rs:159-178).
    */
  def dataStruct: StructType =
    StructType(params.map(p => StructField(p.name, sparkType(p.solType), nullable = true)))

  /** Full decoded-event schema: 4 static fields the macro injects
    * (eth_event_macro/src/lib.rs:201-206) + the typed params.
    */
  def fullStruct: StructType = StructType(
    Seq(
      StructField("block_number", LongType, nullable = false),
      StructField("transaction_hash", BinaryType, nullable = true),
      StructField("address", BinaryType, nullable = false),
      StructField("log_index", LongType, nullable = false)
    ) ++ dataStruct.fields)
}

object EventSchema {
  /** Fixed-size static array `T[k]` → (element type, k); None otherwise. */
  def staticArrayOf(canonical: String): Option[(String, Int)] =
    if (!canonical.endsWith("]") || canonical.endsWith("[]")) None
    else {
      val open = canonical.lastIndexOf('[')
      Some((canonical.substring(0, open),
        canonical.substring(open + 1, canonical.length - 1).toInt))
    }

  /** Tuple type `(T1[ name1],T2[ name2],…)` → component (type,
    * optional name) list; None when `t` isn't a tuple or nests another
    * tuple (nesting stays grammar-excluded). Works on both the declared
    * form (with names) and the canonical form (names stripped).
    */
  def tupleOf(t: String): Option[Seq[(String, Option[String])]] = {
    val s = t.trim
    if (!(s.startsWith("(") && s.endsWith(")"))) None
    else {
      val body = s.substring(1, s.length - 1)
      if (body.contains("(") || body.contains(")")) None
      else Some(body.split(",", -1).toSeq.map { comp =>
        comp.trim.split("\\s+").toSeq match {
          case Seq(tp)     => (tp, None)
          case Seq(tp, nm) => (tp, Some(nm))
          case _           => ("", None) // invalid; rejected by parseParam
        }
      })
    }
  }

  /** Spark type for one canonical Solidity type (see `sparkType`). */
  def sparkTypeOf(solType: String): DataType = solType match {
    case t if t.endsWith("[]") => ArrayType(sparkTypeOf(t.dropRight(2)))
    case t if t.startsWith("(") && t.endsWith(")") =>
      val comps = tupleOf(t).getOrElse(
        throw new IllegalArgumentException(s"unsupported type: $t"))
      StructType(comps.zipWithIndex.map { case ((ct, nm), i) =>
        StructField(nm.getOrElse(s"f$i"), sparkTypeOf(ct), nullable = true)
      })
    case t if staticArrayOf(t).isDefined =>
      ArrayType(sparkTypeOf(staticArrayOf(t).get._1))
    case "address"             => BinaryType
    case "bool"                => BooleanType
    case "string"              => StringType
    // bytes (dynamic) and bytesN, N in 1..32 ONLY — an invalid width
    // must keep failing fast here, not classify as valid binary
    case t if t.startsWith("bytes") && t.drop(5).forall(_.isDigit) &&
      (t.length == 5 || (t.length <= 7 &&
        t.drop(5).toInt >= 1 && t.drop(5).toInt <= 32)) => BinaryType
    // fixed-point: intM raw scaled by 10^-N ⇒ Decimal(38, N); magnitudes
    // past 38-N integer digits null out (the wide-int overflow policy)
    // lastIndexOf: the type name itself contains an 'x' (fi_x_ed)
    case t if t.startsWith("ufixed") || t.startsWith("fixed") =>
      DecimalType(38,
        if (t.exists(_.isDigit)) t.substring(t.lastIndexOf('x') + 1).toInt
        else 18)
    case t if t.startsWith("uint") || t.startsWith("int") => DecimalType(38, 0)
    case other => throw new IllegalArgumentException(s"unsupported type: $other")
  }

  private val ident = "[A-Za-z_][A-Za-z0-9_]*"
  // any uintN/intN accepted syntactically; width validated below (ABI:
  // multiples of 8 in 8..256 — e.g. uint24 in Uniswap V3's PoolCreated).
  // Arrays of every scalar element type are accepted, both dynamic `T[]`
  // and fixed-size `T[k]` (k ≥ 1) — including the dynamic-element
  // string[]/bytes[] forms (offset-indirected tails) and NUMERIC nested
  // arrays `uintN[][]`/`intN[][]`. Tuples `(T1,T2,…)` — Solidity structs
  // in events — accept scalar and dynamic-array-of-scalar `T[]`
  // components (optionally named: `(uint256 amount, address[] routes)`),
  // both bare and as tuple ARRAYS `(…)[]` (static tuples inline, dynamic
  // ones offset-indirected per element). Other nesting (`address[][]`,
  // `T[2][]`, fixed arrays inside tuples, nested tuples) stays excluded
  // by the grammar.
  private val Scalar =
    "address|bool|string|bytes32|bytes|uint(?:[0-9]{1,3})?|int(?:[0-9]{1,3})?"
  // fixed-size byte arrays below a word (`bytes4` selectors, `bytes16`
  // UUIDs, …): static one-word params, value LEFT-aligned. Scalar
  // positions only (not array/tuple elements).
  private val BytesN = "bytes(?:3[01]|[12][0-9]|[1-9])"
  // fixed-point decimals (fixedMxN/ufixedMxN; bare = 128x18): SCALAR
  // positions only — Solidity itself barely implements fixed, and the
  // array/tuple grammar stays closed over the types that exist on chain
  private val FixedRe = "(?:u?fixed(?:[0-9]{1,3}x[0-9]{1,2})?)"
  private val CompRe = s"(?:$Scalar)(?:\\[\\])?".r
  private val TypeRe =
    (s"($Scalar|$BytesN|$FixedRe" +
      s"|(?:$Scalar)\\[[0-9]*\\]" +
      "|(?:uint(?:[0-9]{1,3})?|int(?:[0-9]{1,3})?)\\[\\]\\[\\])").r

  private def validWidth(t: String): Boolean = {
    val elem = t.indexOf('[') match {
      case -1 => t
      case i  =>
        // dynamic `[]` / nested `[][]` carry no size; fixed `[k]` needs k ≥ 1
        val suffix = t.substring(i)
        if (suffix != "[]" && suffix != "[][]") {
          val k = t.substring(i + 1, t.length - 1)
          if (k.nonEmpty && k.toInt < 1) return false
        }
        t.substring(0, i)
    }
    if (elem.startsWith("bytes")) {
      // bytesN widths are BYTE counts 1..32, not bit widths
      val d = elem.drop("bytes".length)
      d.isEmpty || (d.toInt >= 1 && d.toInt <= 32)
    } else if (elem.startsWith("fixed") || elem.startsWith("ufixed")) {
      // fixedMxN: M a multiple of 8 in 8..256 like intM; N (the decimal
      // scale) 1..80 per ABI, capped at 37 here — Spark's Decimal(38,N)
      // needs at least one integer digit to represent anything
      val spec = elem.drop(if (elem.startsWith("ufixed")) 6 else 5)
      spec.isEmpty || {
        val Array(m, n) = spec.split("x")
        m.toInt >= 8 && m.toInt <= 256 && m.toInt % 8 == 0 &&
          n.toInt >= 1 && n.toInt <= 37
      }
    } else {
      val digits = elem.dropWhile(!_.isDigit).takeWhile(_.isDigit)
      digits.isEmpty || {
        val w = digits.toInt
        w >= 8 && w <= 256 && w % 8 == 0
      }
    }
  }

  /** Parse an event declaration, e.g.
    * `Transfer(address indexed from, address indexed to, uint value)`.
    * Throws `IllegalArgumentException` on malformed input.
    */
  def parse(decl: String): EventSchema = {
    val s = decl.trim
    require(!s.startsWith("event "),
      "declaration must not start with the `event` keyword")
    val open = s.indexOf('(')
    require(open > 0, s"expected `Name(` in: $decl")
    val name = s.substring(0, open).trim
    require(name.matches(ident), s"bad event name: `$name`")
    val close = s.lastIndexOf(')')
    require(close > open, s"missing `)` in: $decl")
    val tail = s.substring(close + 1).trim
    val anonymous = tail == "anonymous"
    require(anonymous || tail.isEmpty, s"trailing garbage after declaration: `$tail`")
    val body = s.substring(open + 1, close).trim
    val params =
      if (body.isEmpty) Seq.empty[EventParam]
      else splitTopLevel(body).map(parseParam)
    val dup = params.groupBy(_.name).collectFirst { case (n, ps) if ps.size > 1 => n }
    require(dup.isEmpty, s"duplicate parameter name: ${dup.get}")
    EventSchema(name, params, anonymous)
  }

  /** Split a param list on commas at paren depth 0 only — tuple
    * components carry their own commas.
    */
  private def splitTopLevel(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '('                 => depth += 1
        case ')'                 => depth -= 1
        case ',' if depth == 0   => out += body.substring(start, i); start = i + 1
        case _                   =>
      }
      i += 1
    }
    out += body.substring(start)
    out.result()
  }

  private def parseParam(raw: String): EventParam = {
    val r = raw.trim
    if (r.startsWith("(")) return parseTupleParam(r)
    val toks = r.split("\\s+").toSeq
    toks match {
      case Seq(TypeRe(t), "indexed", n) if n.matches(ident) && validWidth(t) =>
        EventParam(n, t, indexed = true)
      // `address indexed` (unnamed indexed param — legal Solidity) would
      // otherwise match the 2-token case as a NON-indexed param NAMED
      // "indexed": topic0 stays correct, so logs route fine but every
      // param decodes from the wrong slot — silently wrong values. The
      // DSL requires names; an unnamed param must fail loudly.
      case Seq(TypeRe(_), "indexed") =>
        throw new IllegalArgumentException(
          s"bad parameter: `$r` — unnamed params are not supported; " +
            "give the indexed param a name (`address indexed from`)")
      case Seq(TypeRe(t), n) if n.matches(ident) && validWidth(t) =>
        EventParam(n, t, indexed = false)
      case _ => throw new IllegalArgumentException(s"bad parameter: `${r}`")
    }
  }

  /** Tuple param `(T1 [n1],…)[[]] [indexed] name`: components are
    * scalars or dynamic arrays of scalars `T[]` (no fixed-size `[k]`,
    * nested arrays, or nested tuples), optional per-component names. A
    * `[]` suffix makes it a dynamic array of tuples; dynamic components
    * (string/bytes/arrays) are allowed in both forms — a tuple with any
    * dynamic component encodes offset-indirected, per ABI. The stored
    * solType keeps component names (they become struct field names);
    * `canonicalType` strips them for signature hashing.
    */
  private def parseTupleParam(r: String): EventParam = {
    def bad() = throw new IllegalArgumentException(s"bad parameter: `$r`")
    val close = r.indexOf(')')
    if (close < 0) bad()
    val comps = tupleOf(r.substring(0, close + 1)).getOrElse(bad())
    if (comps.isEmpty || !comps.forall { case (t, nm) =>
        CompRe.matches(t) && validWidth(t) && nm.forall(_.matches(ident))
      }) bad()
    // FINAL field names must be unique — a declared name can also
    // collide with the f{i} fallback of an unnamed position (e.g.
    // `(uint, bool f0)`), which would build a struct with two f0 fields
    val fieldNames = comps.zipWithIndex.map { case ((_, nm), i) =>
      nm.getOrElse(s"f$i")
    }
    if (fieldNames.distinct.size != fieldNames.size) bad()
    val tupleT = comps.map {
      case (t, Some(n)) => s"$t $n"
      case (t, None)    => t
    }.mkString("(", ",", ")")
    val rest0 = r.substring(close + 1).trim
    val isArray = rest0.startsWith("[]")
    val solType = if (isArray) tupleT + "[]" else tupleT
    val rest = if (isArray) rest0.drop(2).trim else rest0
    rest.split("\\s+").toSeq match {
      case Seq("indexed", n) if n.matches(ident) =>
        EventParam(n, solType, indexed = true)
      case Seq(n) if n.matches(ident) =>
        EventParam(n, solType, indexed = false)
      case _ => bad()
    }
  }
}

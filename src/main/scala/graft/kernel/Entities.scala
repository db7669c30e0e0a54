package graft.kernel

/** HTML named character references — the subset of the WHATWG table that the
  * golden corpus and common web text exercise (CPython's html.unescape table
  * has ~2200 entries; carrying all of them adds nothing for self-authored
  * goldens — documented deviation, SURVEY.md §0.1 spirit).
  *
  * Semicolon-less legacy forms (HTML4 set) are matched like html.unescape:
  * longest-prefix match, only for names in the legacy set.
  */
object Entities {
  val WithSemicolon: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "iexcl" -> "¡", "cent" -> "¢",
    "pound" -> "£", "curren" -> "¤", "yen" -> "¥",
    "brvbar" -> "¦", "sect" -> "§", "uml" -> "¨",
    "copy" -> "©", "ordf" -> "ª", "laquo" -> "«",
    "not" -> "¬", "shy" -> "­", "reg" -> "®",
    "macr" -> "¯", "deg" -> "°", "plusmn" -> "±",
    "sup2" -> "²", "sup3" -> "³", "acute" -> "´",
    "micro" -> "µ", "para" -> "¶", "middot" -> "·",
    "cedil" -> "¸", "sup1" -> "¹", "ordm" -> "º",
    "raquo" -> "»", "frac14" -> "¼", "frac12" -> "½",
    "frac34" -> "¾", "iquest" -> "¿",
    "Agrave" -> "À", "Aacute" -> "Á", "Acirc" -> "Â",
    "Atilde" -> "Ã", "Auml" -> "Ä", "Aring" -> "Å",
    "AElig" -> "Æ", "Ccedil" -> "Ç", "Egrave" -> "È",
    "Eacute" -> "É", "Ecirc" -> "Ê", "Euml" -> "Ë",
    "Igrave" -> "Ì", "Iacute" -> "Í", "Icirc" -> "Î",
    "Iuml" -> "Ï", "ETH" -> "Ð", "Ntilde" -> "Ñ",
    "Ograve" -> "Ò", "Oacute" -> "Ó", "Ocirc" -> "Ô",
    "Otilde" -> "Õ", "Ouml" -> "Ö", "times" -> "×",
    "Oslash" -> "Ø", "Ugrave" -> "Ù", "Uacute" -> "Ú",
    "Ucirc" -> "Û", "Uuml" -> "Ü", "Yacute" -> "Ý",
    "THORN" -> "Þ", "szlig" -> "ß",
    "agrave" -> "à", "aacute" -> "á", "acirc" -> "â",
    "atilde" -> "ã", "auml" -> "ä", "aring" -> "å",
    "aelig" -> "æ", "ccedil" -> "ç", "egrave" -> "è",
    "eacute" -> "é", "ecirc" -> "ê", "euml" -> "ë",
    "igrave" -> "ì", "iacute" -> "í", "icirc" -> "î",
    "iuml" -> "ï", "eth" -> "ð", "ntilde" -> "ñ",
    "ograve" -> "ò", "oacute" -> "ó", "ocirc" -> "ô",
    "otilde" -> "õ", "ouml" -> "ö", "divide" -> "÷",
    "oslash" -> "ø", "ugrave" -> "ù", "uacute" -> "ú",
    "ucirc" -> "û", "uuml" -> "ü", "yacute" -> "ý",
    "thorn" -> "þ", "yuml" -> "ÿ",
    "OElig" -> "Œ", "oelig" -> "œ", "Scaron" -> "Š",
    "scaron" -> "š", "Yuml" -> "Ÿ", "fnof" -> "ƒ",
    "circ" -> "ˆ", "tilde" -> "˜",
    "ensp" -> " ", "emsp" -> " ", "thinsp" -> " ",
    "zwnj" -> "‌", "zwj" -> "‍", "lrm" -> "‎",
    "rlm" -> "‏", "ndash" -> "–", "mdash" -> "—",
    "lsquo" -> "‘", "rsquo" -> "’", "sbquo" -> "‚",
    "ldquo" -> "“", "rdquo" -> "”", "bdquo" -> "„",
    "dagger" -> "†", "Dagger" -> "‡", "bull" -> "•",
    "hellip" -> "…", "permil" -> "‰", "prime" -> "′",
    "Prime" -> "″", "lsaquo" -> "‹", "rsaquo" -> "›",
    "oline" -> "‾", "frasl" -> "⁄", "euro" -> "€",
    "trade" -> "™", "alefsym" -> "ℵ",
    "larr" -> "←", "uarr" -> "↑", "rarr" -> "→",
    "darr" -> "↓", "harr" -> "↔", "crarr" -> "↵",
    "forall" -> "∀", "part" -> "∂", "exist" -> "∃",
    "empty" -> "∅", "nabla" -> "∇", "isin" -> "∈",
    "notin" -> "∉", "ni" -> "∋", "prod" -> "∏",
    "sum" -> "∑", "minus" -> "−", "lowast" -> "∗",
    "radic" -> "√", "prop" -> "∝", "infin" -> "∞",
    "ang" -> "∠", "and" -> "∧", "or" -> "∨",
    "cap" -> "∩", "cup" -> "∪", "int" -> "∫",
    "there4" -> "∴", "sim" -> "∼", "cong" -> "≅",
    "asymp" -> "≈", "ne" -> "≠", "equiv" -> "≡",
    "le" -> "≤", "ge" -> "≥", "sub" -> "⊂",
    "sup" -> "⊃", "nsub" -> "⊄", "sube" -> "⊆",
    "supe" -> "⊇", "oplus" -> "⊕", "otimes" -> "⊗",
    "perp" -> "⊥", "sdot" -> "⋅",
    "Alpha" -> "Α", "Beta" -> "Β", "Gamma" -> "Γ",
    "Delta" -> "Δ", "Epsilon" -> "Ε", "Zeta" -> "Ζ",
    "Eta" -> "Η", "Theta" -> "Θ", "Iota" -> "Ι",
    "Kappa" -> "Κ", "Lambda" -> "Λ", "Mu" -> "Μ",
    "Nu" -> "Ν", "Xi" -> "Ξ", "Omicron" -> "Ο",
    "Pi" -> "Π", "Rho" -> "Ρ", "Sigma" -> "Σ",
    "Tau" -> "Τ", "Upsilon" -> "Υ", "Phi" -> "Φ",
    "Chi" -> "Χ", "Psi" -> "Ψ", "Omega" -> "Ω",
    "alpha" -> "α", "beta" -> "β", "gamma" -> "γ",
    "delta" -> "δ", "epsilon" -> "ε", "zeta" -> "ζ",
    "eta" -> "η", "theta" -> "θ", "iota" -> "ι",
    "kappa" -> "κ", "lambda" -> "λ", "mu" -> "μ",
    "nu" -> "ν", "xi" -> "ξ", "omicron" -> "ο",
    "pi" -> "π", "rho" -> "ρ", "sigmaf" -> "ς",
    "sigma" -> "σ", "tau" -> "τ", "upsilon" -> "υ",
    "phi" -> "φ", "chi" -> "χ", "psi" -> "ψ",
    "omega" -> "ω")

  /** HTML4 names html.unescape also accepts without the semicolon. */
  val Legacy: Set[String] = Set(
    "amp", "lt", "gt", "quot", "nbsp", "copy", "reg", "shy", "laquo",
    "raquo", "iexcl", "cent", "pound", "curren", "yen", "brvbar", "sect",
    "uml", "ordf", "not", "macr", "deg", "plusmn", "sup2", "sup3", "acute",
    "micro", "para", "middot", "cedil", "sup1", "ordm", "frac14", "frac12",
    "frac34", "iquest", "times", "divide", "szlig", "aelig", "aacute",
    "eacute", "iacute", "oacute", "uacute", "agrave", "egrave", "igrave",
    "ograve", "ugrave", "auml", "euml", "iuml", "ouml", "uuml", "yuml",
    "acirc", "ecirc", "icirc", "ocirc", "ucirc", "atilde", "ntilde",
    "otilde", "aring", "ccedil", "eth", "thorn", "yacute", "oslash",
    "AElig", "Aacute", "Eacute", "Iacute", "Oacute", "Uacute", "Agrave",
    "Egrave", "Igrave", "Ograve", "Ugrave", "Auml", "Euml", "Iuml", "Ouml",
    "Uuml", "Acirc", "Ecirc", "Icirc", "Ocirc", "Ucirc", "Atilde",
    "Ntilde", "Otilde", "Aring", "Ccedil", "ETH", "THORN", "Yacute",
    "Oslash")

  private val maxNameLen = WithSemicolon.keys.map(_.length).max

  /** html.unescape equivalent over a whole string: numeric (&#10; &#x0a;)
    * and named references; legacy names match without ';' (longest first).
    * Unknown references pass through unchanged.
    */
  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    unescapeAppend(s, 0, s.length, sb)
    sb.toString
  }

  /** Unescape `s[from, until)` appending into `sb` — no substring copy,
    * and the spans between references append via the BULK java range
    * append (arraycopy), not per-char (r03 parse profile: the tokenizer's
    * per-text-run substring + unescape allocations; a first fix that
    * looped chars measured slower than the substring it replaced).
    */
  def unescapeAppend(s: String, from: Int, until: Int, sb: StringBuilder): Unit = {
    var i = from
    while (i < until) {
      // bounded scan — String.indexOf would run past `until` to the end
      // of the whole document on runs without '&' (O(n²) over a page)
      var amp = i
      while (amp < until && s.charAt(amp) != '&') amp += 1
      if (amp == until) {
        sb.underlying.append(s, i, until)
        i = until
      } else {
        if (amp > i) sb.underlying.append(s, i, amp)
        val consumed = decodeRef(s, amp, sb, until)
        if (consumed == 0) { sb.append('&'); i = amp + 1 } else i = amp + consumed
      }
    }
  }

  /** Try to decode a reference at s(i)=='&'; append to sb and return chars
    * consumed, or 0 on no match.
    */
  def decodeRef(s: String, i: Int, sb: StringBuilder): Int =
    decodeRef(s, i, sb, s.length)

  /** Range form: the reference may not read at or past `limit` —
    * equivalent to decodeRef over substring(0, limit) without the copy.
    */
  def decodeRef(s: String, i: Int, sb: StringBuilder, limit: Int): Int = {
    val n = limit
    if (i + 1 >= n) return 0
    if (s.charAt(i + 1) == '#') {
      var j = i + 2
      var hex = false
      if (j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) {
        hex = true; j += 1
      }
      val start = j
      while (j < n && isDigitFor(s.charAt(j), hex)) j += 1
      if (j == start) return 0
      val cp0 =
        try java.lang.Long.parseLong(s.substring(start, j), if (hex) 16 else 10)
        catch { case _: NumberFormatException => return 0 }
      val withSemi = j < n && s.charAt(j) == ';'
      val end = if (withSemi) j + 1 else j
      // html.unescape maps invalid/controls per the HTML5 spec table;
      // keep the common cases: windows-1252 remapping for 0x80-0x9f.
      val cp = remapNumeric(cp0)
      sb.appendAll(Character.toChars(cp))
      end - i
    } else {
      // named: longest match, with or without ';'
      var j = i + 1
      val lim = math.min(n, i + 1 + maxNameLen + 1)
      while (j < lim && isNameChar(s.charAt(j))) j += 1
      if (j < n && s.charAt(j) == ';') {
        val name = s.substring(i + 1, j)
        WithSemicolon.get(name) match {
          case Some(v) => sb.append(v); return j - i + 1
          case None    =>
        }
      }
      // semicolon-less legacy: longest prefix in Legacy
      var k = math.min(j, i + 1 + maxNameLen)
      while (k > i + 1) {
        val name = s.substring(i + 1, k)
        if (Legacy.contains(name)) {
          sb.append(WithSemicolon(name)); return k - i
        }
        k -= 1
      }
      0
    }
  }

  private def isDigitFor(c: Char, hex: Boolean): Boolean =
    (c >= '0' && c <= '9') ||
    (hex && ((c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))

  private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  private def remapNumeric(cp: Long): Int = {
    if (cp == 0 || cp > 0x10ffff || (cp >= 0xd800 && cp <= 0xdfff))
      return 0xfffd
    if (cp == 0x0d) return 0x0d
    if (cp >= 0x80 && cp <= 0x9f) {
      // HTML5: interpret as windows-1252.
      val map = Map(
        0x80 -> 0x20ac, 0x82 -> 0x201a, 0x83 -> 0x0192, 0x84 -> 0x201e,
        0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02c6,
        0x89 -> 0x2030, 0x8a -> 0x0160, 0x8b -> 0x2039, 0x8c -> 0x0152,
        0x8e -> 0x017d, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201c,
        0x94 -> 0x201d, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
        0x98 -> 0x02dc, 0x99 -> 0x2122, 0x9a -> 0x0161, 0x9b -> 0x203a,
        0x9c -> 0x0153, 0x9e -> 0x017e, 0x9f -> 0x0178)
      return map.getOrElse(cp.toInt, cp.toInt)
    }
    cp.toInt
  }
}

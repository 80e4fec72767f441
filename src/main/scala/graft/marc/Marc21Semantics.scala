package graft.marc

/** Opinionated MARC21 semantic/derived-field operators (SURVEY.md §2.5).
  *
  * Each is a pure function MarcRecord → value(s); semantics (including the
  * reference's documented quirks, which its own tests pin) ported from
  * /root/reference/lib/traject/macros/marc21_semantics.rb — line citations on
  * each member. Spark exposure is via MarcFunctions-style UDF wrappers; the
  * functions themselves are engine-agnostic and golden-tested against the
  * reference's fixture corpus.
  */
object Marc21Semantics {

  /** Ruby String#to_i: optional-signed leading digit prefix, else 0. */
  private val ToIPrefix = """\A\s*([+-]?\d+)""".r
  private def rubyToI(s: String): Int =
    if (s == null) 0
    else ToIPrefix.findPrefixMatchOf(s).map(_.group(1).toInt).getOrElse(0)

  // --- oclcnum (marc21_semantics.rb:18-48) --------------------------------

  private val OclcPat =
    """\A\s*(?:(?:\(OCoLC\))|(?:\(OCoLC\))?(?:(?:ocm)|(?:ocn)|(?:on)))(\d+)""".r

  def oclcnumExtract(num: String): Option[String] =
    OclcPat.findPrefixMatchOf(num).map(_.group(1))

  def oclcnum(rec: MarcRecord, spec: String = "035a"): Vector[String] = {
    val ex = MarcExtractor.cached(spec, separator = None)
    ex.extract(rec).flatMap(v => oclcnumExtract(v)).distinct
  }

  // --- sortable author/title (marc21_semantics.rb:66-118) -----------------

  def sortableAuthor(rec: MarcRecord): String = {
    val onexx = MarcExtractor("100:110:111").extract(rec).headOption
      .filter(_ != null).map(_.trim)
    val titleEx = MarcExtractor("240:245")
    val titles = titleEx.matchingLines(rec).map { case (field, _) =>
      val nonFiling = rubyToI(field.ind2)
      val str = field.subfields
        .map(sf => TrimPunctuation(sf.value.trim).trim).mkString(" ")
      str.drop(nonFiling)
    }
    val title = titles.headOption.map(_.trim)
    (onexx.toSeq ++ title.toSeq).mkString("   ")
  }

  def sortableTitle(rec: MarcRecord): Option[String] = {
    val ex = MarcExtractor("245ab")
    val lines = ex.matchingLines(rec)
    val collected = lines.map { case (field, spec) =>
      ex.collectSubfields(field, spec).headOption.orElse(field.subfield("k")) match {
        case None => return None // reference bails the whole function (line 109)
        case Some(str) =>
          TrimPunctuation(str.drop(rubyToI(field.ind2)))
      }
    }
    collected.headOption
  }

  // --- filing version (marc21_semantics.rb:129-181) -----------------------

  /** Reference quirk preserved: "first alphabetic subfield" is computed with
    * Array#first which ignores its block — so it's just the FIRST subfield's
    * code (line 174; pinned by the 245h test). */
  def filingVersion(field: MarcField, str: String, spec: MarcSpec): String = {
    if (field.isControl) return str
    val ind2 = rubyToI(field.ind2)
    if (ind2 <= 0) return str
    val firstCode = field.subfields.headOption.map(_.code)
    spec.subfields match {
      case Some(subs) if firstCode.exists(subs.contains) => str.drop(ind2)
      case _ => str
    }
  }

  def extractFilingVersion(rec: MarcRecord, spec: String = "245abdefghknp",
                           includeOriginal: Boolean = false): Vector[String] = {
    val ex = MarcExtractor(spec)
    ex.collectMatchingLines(rec) { (field, sp) =>
      ex.collectSubfields(field, sp).headOption.filter(_.nonEmpty) match {
        case None => Nil
        case Some(str) =>
          val filed = filingVersion(field, str, sp)
          if (includeOriginal) Vector(str, filed).distinct else Vector(filed)
      }
    }
  }

  // --- languages (marc21_semantics.rb:195-223) ----------------------------

  def languages(rec: MarcRecord, spec: String = "008[35-37]:041a:041d"): Vector[String] = {
    val ex = MarcExtractor.cached(spec, separator = None)
    val codes = ex.collectMatchingLines(rec) { (field, sp) =>
      if (field.isControl)
        Vector(if (sp.hasByteSlice) sp.byteSlice(field.value).orNull else field.value)
      else
        ex.collectSubfields(field, sp).flatMap { value =>
          if (value.length == 3) Vector(value)
          else value.grouped(3).toVector // packed "engfre" → ["eng","fre"]
        }
    }.distinct
    TranslationMap.named("marc_languages").translateArray(codes.filter(_ != null))
  }

  // --- series facet (marc21_semantics.rb:230-245) -------------------------

  def seriesFacet(rec: MarcRecord,
                  spec: String = "440a:490a:800abcdt:810abcdt:811acdeft:830adfgklmnoprst"): Vector[String] = {
    val ex = MarcExtractor(spec)
    ex.collectMatchingLines(rec) { (field, sp) =>
      if (field.tag == "490" && field.ind1 == "1") Nil // traced series: skip
      else ex.collectSubfields(field, sp)
    }.map(TrimPunctuation.apply)
  }

  // --- instruments (marc21_semantics.rb:252-305) --------------------------

  def instrumentationHumanized(rec: MarcRecord, spec: String = "048ab"): Vector[String] = {
    val tm = TranslationMap.named("marc_instruments")
    val ex = MarcExtractor.cached(spec, separator = None)
    ex.extract(rec)
      .map(v => tm.lookup(v.take(2)).map(_.mkString(" ")).orNull)
      .distinct
  }

  def instrumentCodesNormalized(rec: MarcRecord): Vector[String] = {
    val soloist = ".s"
    val ex = MarcExtractor.cached("048", separator = None)
    ex.collectMatchingLines(rec) { (field, _) =>
      field.subfields.flatMap { sf =>
        val v = sf.value
        if (v.length < 2) Nil
        else {
          val b = sf.code == "b"
          val base = Vector(v) ++ (if (b) Vector(v + soloist) else Nil)
          val pref =
            if (v.length >= 4) {
              val bare = v.take(2)
              Vector(bare) ++ (if (b) Vector(bare + soloist) else Nil)
            } else Nil
          base ++ pref
        }
      }
    }.distinct
  }

  // --- publication date state machine (marc21_semantics.rb:316-394) -------

  def publicationDate(rec: MarcRecord, estimateTolerance: Int = 15,
                      minYear: Int = 500,
                      maxYear: Int = java.time.Year.now.getValue + 6): Option[Int] = {
    val field008 = MarcExtractor("008").extract(rec).headOption.filter(_ != null)
    var found: Option[Int] = None

    field008 match {
      case Some(f008) if f008.length >= 11 =>
        val dateType = f008.charAt(6)
        val date1Str = f008.slice(7, 11)
        val date2Str = if (f008.length > 15) f008.slice(11, 15) else date1Str

        if (dateType == 'q' && date1Str != date2Str) {
          // sub (first occurrence only), then ruby to_i prefix parse
          val d1 = rubyToI(date1Str.replaceFirst("u", "0"))
          val d2 = rubyToI(date2Str.replaceFirst("u", "9"))
          if (d2 > d1 && (d2 - d1) <= estimateTolerance)
            found = Some((d2 + d1) / 2)
        }
        if (found.isEmpty && dateType != 'n' && dateType != 'q') {
          val dateStr0 =
            if ((dateType == 'r' || dateType == 'p') && rubyToI(date2Str) != 0) date2Str
            else date1Str
          val ucount = dateStr0.count(_ == 'u')
          val dateStr = dateStr0.replace('u', '0')
          val date = rubyToI(dateStr)
          if (ucount > 0 && date != 0) {
            val delta = math.pow(10, ucount).toInt
            if (delta <= estimateTolerance) found = Some(date + delta / 2)
          } else if (date != 0) found = Some(date)
        }
      case _ =>
    }

    if (found.isEmpty) {
      val v264c = MarcExtractor.cached("264c", separator = None).extract(rec)
        .headOption.filter(_ != null)
      val v260c = MarcExtractor.cached("260c", separator = None).extract(rec)
        .headOption.filter(_ != null)
      found = v264c.flatMap(v => FourDigit.findFirstIn(v))
        .orElse(v260c.flatMap(v => FourDigit.findFirstIn(v)))
        .map(_.toInt)
    }

    found.filter(y => y >= minYear && y <= maxYear)
  }

  // --- LCC broad category (marc21_semantics.rb:396-433) -------------------

  val LccRegex = """\A *[A-Z]{1,3}[ .]*(?:(\d+)(?:\s*?\.\s*?(\d+))?).*""".r

  // hot-path patterns compiled once (String.replaceAll would recompile per
  // value per record)
  private val FourDigit = """(\d{4})""".r
  private val TrailingDotSpace = java.util.regex.Pattern.compile("""\. *\z""")
  private val FirstDotSpace = java.util.regex.Pattern.compile("""\. *""")
  private val TrailingHyphens = java.util.regex.Pattern.compile("""\-+\z""")
  private val TrailingDot = java.util.regex.Pattern.compile("""\.\z""")
  private val EraSpecial =
    """\A\s*.+,\s+(ca.\s+)?\d\d\d\d?(-\d\d\d\d?)?( B\.C\.)?[.,; ]*\z""".r

  @inline private def stripTrailingDot(s: String): String =
    TrailingDotSpace.matcher(s).replaceAll("")

  def lccBroadCategory(rec: MarcRecord, default: Option[String] = Some("Unknown"),
                       spec: String = "050a:060a:090a:096a"): Vector[String] = {
    val tm = TranslationMap.named("lcc_top_level")
    val ex = MarcExtractor.cached(spec, separator = None)
    val candidates = ex.extract(rec).filter(c =>
      c != null && LccRegex.pattern.matcher(c).matches())
    val mapped = tm.translateArray(
      candidates.map(c => c.dropWhile(_.isWhitespace).take(1))).distinct
    if (mapped.isEmpty) default.map(Vector(_)).getOrElse(Vector.empty) else mapped
  }

  // --- geo facet (marc21_semantics.rb:444-491) ----------------------------

  def geoFacet(rec: MarcRecord,
               aFieldsSpec: String = "651a:691a",
               zFieldsSpec: String = "600:610:611:630:648:650:654:655:656:690:651:691"): Vector[String] = {
    val geoMap = TranslationMap.named("marc_geographic")
    val from043 = MarcExtractor.cached("043a", separator = None).extract(rec)
      .flatMap(code => geoMap.lookup(TrailingHyphens.matcher(code).replaceAll("")).map(_.mkString(" ")))
    val fromA = MarcExtractor.cached(aFieldsSpec, separator = None).extract(rec)
      .map(v => FirstDotSpace.matcher(v).replaceFirst("")) // unanchored first-occurrence sub, as in the reference
    val zEx = MarcExtractor(zFieldsSpec)
    val fromZ = zEx.collectMatchingLines(rec) { (field, _) =>
      val zs = field.subfields.filter(_.code == "z").map(_.value)
        .map(stripTrailingDot)
      if (zs.length == 2) Vector(s"${zs(1)} (${zs(0)})", zs(0))
      else zs.toVector
    }
    (from043 ++ fromA ++ fromZ).distinct
  }

  // --- era facet (marc21_semantics.rb:499-531) ----------------------------

  def eraFacet(rec: MarcRecord): Vector[String] = {
    val ordinary = MarcExtractor("600y:610y:611y:630y:648ay:650y:654y:656y:690y")
      .extract(rec).map(stripTrailingDot)
    val specialEx = MarcExtractor("651:691")
    val special = specialEx.collectMatchingLines(rec) { (field, _) =>
      field.subfields.filter(_.code == "y").map { sf =>
        if (EraSpecial.pattern.matcher(sf.value).matches())
          s"${field.subfield("a").getOrElse("")}: ${stripTrailingDot(sf.value)}"
        else stripTrailingDot(sf.value)
      }.toVector
    }
    (ordinary ++ special).distinct
  }

  // --- pre-coordinated LCSH (marc21_semantics.rb:540-596) -----------------

  def assembleLcsh(field: MarcField, subdSeparator: String = " — ",
                   otherSeparator: String = " "): Option[String] = {
    val subdCodes = Set("v", "x", "y", "z")
    val sb = new StringBuilder
    field.subfields.zipWithIndex.foreach { case (sf, i) =>
      if (sf.code.length == 1 && sf.code.charAt(0).isLetter && sf.code == sf.code.toLowerCase) {
        val prefix =
          if (subdCodes.contains(sf.code)) subdSeparator
          else if (i == 0) "" else otherSeparator
        sb.append(prefix).append(sf.value)
      }
    }
    val str = TrailingDot.matcher(sb.toString).replaceAll("")
    if (str.isEmpty) None else Some(str)
  }

  def lcshFormatted(rec: MarcRecord, spec: String = "600:610:611:630:648:650:651:654:662",
                    subdSeparator: String = " — "): Vector[String] = {
    val ex = MarcExtractor(spec)
    ex.collectMatchingLines(rec) { (field, _) =>
      assembleLcsh(field, subdSeparator).toVector
    }
  }
}

package graft.fixtures

import graft.audio.AudioSynth.mix64

/** Deterministic persons corpus re-expressing the shape of the reference's
  * test fixtures (100 records with Name/Phone/Email/Company/Counter/Bio/
  * Country/City, `/root/reference/testserver/web/data/persons.json`, fields
  * per `/root/reference/testserver/main.go:50-59`). Content is synthesized
  * here from seeded lists — nothing is copied from the reference data.
  *
  * Phones are `string OR [string]` in the reference (the dynamic 0/1/N
  * quirk, SURVEY.md §1.2): every 5th person here carries two phones so the
  * array path is exercised.
  */
final case class Person(
    idx: Int,            // 0-based
    name: String,
    phones: Seq[String], // 1 or 2 entries
    email: String,
    company: String,
    counter: String,     // "1".."100"
    bio: String,
    country: String,
    city: String)

object Persons {

  val N = 100

  private val firstNames = Vector(
    "Avery", "Blake", "Casey", "Dana", "Ellis", "Finley", "Gray", "Harper",
    "Indra", "Jules", "Kiran", "Logan", "Mika", "Noel", "Oakley", "Parker",
    "Quinn", "Reese", "Sage", "Tatum")
  private val lastNames = Vector(
    "Alder", "Birch", "Cedar", "Dunne", "Elm", "Frost", "Gale", "Hollis",
    "Iris", "Juniper", "Kestrel", "Larch", "Moss", "North", "Orchid", "Pine",
    "Quill", "Rowan", "Sorrel", "Thorn")
  private val companyWords = Vector(
    "Tellus", "Aurora", "Vertex", "Nimbus", "Quartz", "Meridian", "Solace",
    "Harbor", "Lattice", "Onyx", "Prairie", "Cobalt", "Drift", "Ember")
  private val companySuffix = Vector("Incorporated", "LLC", "Industries", "Labs", "Group")
  private val domains = Vector("example.com", "mail.test", "corp.example", "post.test")
  private val bioWords = Vector(
    "lorem", "ipsum", "dolor", "sit", "amet", "consectetur", "adipiscing",
    "elit", "sed", "do", "eiusmod", "tempor", "incididunt", "ut", "labore",
    "et", "dolore", "magna", "aliqua", "enim", "minim", "veniam", "quis",
    "nostrud", "exercitation", "ullamco", "laboris", "nisi", "aliquip")

  /** country -> cities; 5 countries x 3 cities, as in the reference's
    * country -> city -> persons hierarchy (`testserver/main.go:392`). */
  val geo: Vector[(String, Vector[String])] = Vector(
    "United States" -> Vector("New York", "Chicago", "Austin"),
    "Germany"       -> Vector("Berlin", "Munich", "Hamburg"),
    "Japan"         -> Vector("Tokyo", "Osaka", "Kyoto"),
    "Brazil"        -> Vector("Sao Paulo", "Recife", "Manaus"),
    "Canada"        -> Vector("Toronto", "Vancouver", "Montreal"))

  @inline private def pick[A](xs: Vector[A], h: Long): A =
    xs((java.lang.Long.remainderUnsigned(h, xs.length.toLong)).toInt)

  private def phone(h: Long): String = {
    val a = 200 + java.lang.Long.remainderUnsigned(mix64(h), 700L)
    val b = 100 + java.lang.Long.remainderUnsigned(mix64(h + 1), 900L)
    val c = java.lang.Long.remainderUnsigned(mix64(h + 2), 10000L)
    f"1-$a%03d-$b%03d-$c%04d"
  }

  def person(idx: Int): Person = {
    val h = mix64(0x5EED_0042L + idx)
    val first = pick(firstNames, h)
    val last = pick(lastNames, mix64(h + 17))
    val name = s"$first $last"
    val phones =
      if (idx % 5 == 0) Seq(phone(h + 100), phone(h + 200)) else Seq(phone(h + 100))
    val email = s"${first.toLowerCase}.${last.toLowerCase}@${pick(domains, mix64(h + 3))}"
    val company = s"${pick(companyWords, mix64(h + 4))} ${pick(companyWords, mix64(h + 5))} ${pick(companySuffix, mix64(h + 6))}"
    val nBio = 8 + (java.lang.Long.remainderUnsigned(mix64(h + 7), 13L)).toInt
    val bio = (0 until nBio).map(i => pick(bioWords, mix64(h + 8 + i))).mkString(" ")
    val (country, cities) = geo(idx % geo.length)
    val city = cities((idx / geo.length) % cities.length)
    Person(idx, name, phones, email, company, (idx + 1).toString, bio, country, city)
  }

  lazy val all: Vector[Person] = (0 until N).map(person).toVector

  /** Render a person as the selector-addressable transcript format.
    *
    * This is the analog of the reference's HTML cards
    * (`testserver/web/templates`): a flat tag-per-field markup so that
    * DFK-style Field(selector, attrs) extraction (SURVEY.md §2.3 P1)
    * stays meaningful — `text` = element text, `href` = href attribute,
    * repeated <phone> tags exercise the 0/1/N collapse rule.
    */
  def transcript(p: Person): String = {
    val sb = new StringBuilder(256)
    sb.append(s"""<card id="c${p.counter}">""")
    sb.append(s"""<name href="/person/${p.counter}">${p.name}</name>""")
    p.phones.foreach(ph => sb.append(s"<phone>$ph</phone>"))
    sb.append(s"<email>${p.email}</email>")
    sb.append(s"""<company href="/company/${p.company.toLowerCase.replace(' ', '-')}">${p.company}</company>""")
    sb.append(s"<counter>${p.counter}</counter>")
    sb.append(s"<country>${p.country}</country>")
    sb.append(s"<city>${p.city}</city>")
    sb.append(s"<bio>${p.bio}</bio>")
    sb.append("</card>")
    sb.toString
  }

  /** Enriched transcript for the late-update stream (the details-join
    * re-expression, `/root/reference/scrape/scrape.go:548-582`): adds a
    * <details> block carrying fields only visible after the "follow". */
  def enrichedTranscript(p: Person): String = {
    val base = transcript(p)
    val details =
      s"""<details><title>${p.name} of ${p.company}</title><counter>${p.counter}</counter></details>"""
    base.stripSuffix("</card>") + details + "</card>"
  }
}

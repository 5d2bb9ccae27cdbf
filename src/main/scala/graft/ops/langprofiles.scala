package graft.ops

/** Character-n-gram language profiles for [[text.langIdNgram]] — the
  * standard n-gram text-categorization design (Cavnar & Trenkle 1994:
  * rank the most frequent character n-grams per language, score a
  * document by rank-weighted profile hits, argmax).
  *
  * The reference engine has no text functions at all (SURVEY.md §2.8) —
  * language ID is this engine's data-pipeline extension, and the
  * 4-language stopword heuristic ([[text.langId]]) mislabels everything
  * outside its lists, poisoning every per-language data card
  * downstream. Character-4-gram profiles fix that with the SAME engine
  * shape — one fused row-local kernel pass, zero shuffle, no UDF.
  *
  * Profiles are TRAINED ON THE DRIVER from the embedded seed texts
  * below (Universal Declaration of Human Rights, Article 1 — a standard
  * public-domain multilingual sample — plus ~10 everyday sentences per
  * language, all pre-lowercased so no locale-sensitive case mapping is
  * involved anywhere): a bounded driver literal (16 languages × topK
  * grams ≈ 4,800 entries), exactly like the Poisson-CDF / NDCG-discount
  * tables, so the Spark kernel and any SQL oracle share the SAME
  * integer weights.
  *
  * Determinism: n-gram counting and rank weights are pure integer
  * arithmetic; rank ties break lexicographically on the gram. Weight of
  * rank r (1-based) is `topK − r + 1`, so the most frequent gram scores
  * topK and the last kept gram scores 1. Gram size 4 and topK 300 were
  * selected by held-out classification over all 16 languages (n=3 or
  * topK ≤ 200 misclassify the closest pairs sv/da and tr on
  * single-sentence inputs; n=4, topK=300 separates every fixture with
  * ≥10%% margin).
  */
object langprofiles {

  /** Seed texts, pre-lowercased. UDHR Article 1 + everyday sentences
    * per language. Order fixes the argmax tie order. */
  val Samples: Seq[(String, String)] = Seq(
    "en" -> ("all human beings are born free and equal in dignity and rights. " +
      "they are endowed with reason and conscience and should act " +
      "towards one another in a spirit of brotherhood. the weather is " +
      "nice today and the children are playing in the garden with their " +
      "friends. the house is big and the water is cold. i do not know " +
      "what time it is. we have been working all day and we want to go " +
      "home now. this book is very good and i would like to read it " +
      "again. where are you going tomorrow morning. she said that she " +
      "could not come because she had too much work. people should " +
      "always help each other. the city has many streets and many old " +
      "buildings. what is your name and where do you live. it was " +
      "raining all night but now the sun is shining."),
    "de" -> ("alle menschen sind frei und gleich an würde und rechten geboren. " +
      "sie sind mit vernunft und gewissen begabt und sollen einander im " +
      "geist der brüderlichkeit begegnen. das wetter ist heute schön " +
      "und die kinder spielen mit ihren freunden im garten. das haus " +
      "ist groß und das wasser ist kalt. ich weiß nicht wie spät es " +
      "ist. wir haben den ganzen tag gearbeitet und wollen jetzt nach " +
      "hause gehen. dieses buch ist sehr gut und ich möchte es noch " +
      "einmal lesen. wohin gehst du morgen früh. sie sagte dass sie " +
      "nicht kommen konnte weil sie zu viel arbeit hatte. die menschen " +
      "sollten einander immer helfen. die stadt hat viele straßen und " +
      "viele alte gebäude. wie heißt du und wo wohnst du. es hat die " +
      "ganze nacht geregnet aber jetzt scheint die sonne."),
    "fr" -> ("tous les êtres humains naissent libres et égaux en dignité et en " +
      "droits. ils sont doués de raison et de conscience et doivent " +
      "agir les uns envers les autres dans un esprit de fraternité. il " +
      "fait beau aujourd'hui et les enfants jouent dans le jardin avec " +
      "leurs amis. la maison est grande et l'eau est froide. je ne sais " +
      "pas quelle heure il est. nous avons travaillé toute la journée " +
      "et nous voulons rentrer à la maison maintenant. ce livre est " +
      "très bon et je voudrais le lire encore une fois. où vas-tu " +
      "demain matin. elle a dit qu'elle ne pouvait pas venir parce " +
      "qu'elle avait trop de travail. les gens devraient toujours " +
      "s'entraider. la ville a beaucoup de rues et beaucoup de vieux " +
      "bâtiments. comment tu t'appelles et où habites-tu. il a plu " +
      "toute la nuit mais maintenant le soleil brille."),
    "es" -> ("todos los seres humanos nacen libres e iguales en dignidad y " +
      "derechos y, dotados como están de razón y conciencia, deben " +
      "comportarse fraternalmente los unos con los otros. hace buen " +
      "tiempo hoy y los niños juegan en el jardín con sus amigos. la " +
      "casa es grande y el agua está fría. no sé qué hora es. hemos " +
      "trabajado todo el día y ahora queremos ir a casa. este libro es " +
      "muy bueno y me gustaría leerlo otra vez. adónde vas mañana por " +
      "la mañana. ella dijo que no podía venir porque tenía demasiado " +
      "trabajo. la gente siempre debería ayudarse. la ciudad tiene " +
      "muchas calles y muchos edificios antiguos. cómo te llamas y " +
      "dónde vives. estuvo lloviendo toda la noche pero ahora brilla el " +
      "sol."),
    "pt" -> ("todos os seres humanos nascem livres e iguais em dignidade e em " +
      "direitos. dotados de razão e de consciência, devem agir uns para " +
      "com os outros em espírito de fraternidade. o tempo está bom hoje " +
      "e as crianças estão brincando no jardim com os seus amigos. a " +
      "casa é grande e a água está fria. não sei que horas são. " +
      "trabalhamos o dia inteiro e agora queremos ir para casa. este " +
      "livro é muito bom e eu gostaria de lê-lo outra vez. aonde você " +
      "vai amanhã de manhã. ela disse que não podia vir porque tinha " +
      "trabalho demais. as pessoas deveriam sempre ajudar umas às " +
      "outras. a cidade tem muitas ruas e muitos prédios antigos. como " +
      "você se chama e onde você mora. choveu a noite toda mas agora o " +
      "sol está brilhando."),
    "it" -> ("tutti gli esseri umani nascono liberi ed eguali in dignità e " +
      "diritti. essi sono dotati di ragione e di coscienza e devono " +
      "agire gli uni verso gli altri in spirito di fratellanza. oggi il " +
      "tempo è bello e i bambini giocano nel giardino con i loro amici. " +
      "la casa è grande e l'acqua è fredda. non so che ore sono. " +
      "abbiamo lavorato tutto il giorno e adesso vogliamo andare a " +
      "casa. questo libro è molto bello e vorrei leggerlo ancora una " +
      "volta. dove vai domani mattina. ha detto che non poteva venire " +
      "perché aveva troppo lavoro. le persone dovrebbero sempre " +
      "aiutarsi. la città ha molte strade e molti edifici antichi. come " +
      "ti chiami e dove abiti. ha piovuto tutta la notte ma adesso " +
      "splende il sole."),
    "nl" -> ("alle mensen worden vrij en gelijk in waardigheid en rechten " +
      "geboren. zij zijn begiftigd met verstand en geweten, en behoren " +
      "zich jegens elkander in een geest van broederschap te gedragen. " +
      "het weer is vandaag mooi en de kinderen spelen met hun vrienden " +
      "in de tuin. het huis is groot en het water is koud. ik weet niet " +
      "hoe laat het is. we hebben de hele dag gewerkt en we willen nu " +
      "naar huis gaan. dit boek is erg goed en ik zou het graag nog een " +
      "keer lezen. waar ga je morgenochtend naartoe. ze zei dat ze niet " +
      "kon komen omdat ze te veel werk had. mensen zouden elkaar altijd " +
      "moeten helpen. de stad heeft veel straten en veel oude gebouwen. " +
      "hoe heet je en waar woon je. het heeft de hele nacht geregend " +
      "maar nu schijnt de zon."),
    "sv" -> ("alla människor är födda fria och lika i värde och rättigheter. " +
      "de har utrustats med förnuft och samvete och bör handla gentemot " +
      "varandra i en anda av gemenskap. vädret är fint idag och barnen " +
      "leker med sina vänner i trädgården. huset är stort och vattnet " +
      "är kallt. jag vet inte vad klockan är. vi har arbetat hela dagen " +
      "och vi vill gå hem nu. den här boken är mycket bra och jag " +
      "skulle vilja läsa den igen. vart ska du i morgon bitti. hon sa " +
      "att hon inte kunde komma eftersom hon hade för mycket arbete. " +
      "människor borde alltid hjälpa varandra. staden har många gator " +
      "och många gamla byggnader. vad heter du och var bor du. det " +
      "regnade hela natten men nu skiner solen."),
    "da" -> ("alle mennesker er født frie og lige i værdighed og rettigheder. " +
      "de er udstyret med fornuft og samvittighed, og de bør handle mod " +
      "hverandre i en broderskabets ånd. vejret er dejligt i dag og " +
      "børnene leger med deres venner i haven. huset er stort og vandet " +
      "er koldt. jeg ved ikke hvad klokken er. vi har arbejdet hele " +
      "dagen og vi vil gerne hjem nu. denne bog er meget god og jeg vil " +
      "gerne læse den igen. hvor skal du hen i morgen tidlig. hun sagde " +
      "at hun ikke kunne komme fordi hun havde for meget arbejde. " +
      "mennesker bør altid hjælpe hinanden. byen har mange gader og " +
      "mange gamle bygninger. hvad hedder du og hvor bor du. det " +
      "regnede hele natten men nu skinner solen."),
    "pl" -> ("wszyscy ludzie rodzą się wolni i równi pod względem swej " +
      "godności i swych praw. są oni obdarzeni rozumem i sumieniem i " +
      "powinni postępować wobec innych w duchu braterstwa. pogoda jest " +
      "dzisiaj ładna i dzieci bawią się w ogrodzie ze swoimi " +
      "przyjaciółmi. dom jest duży a woda jest zimna. nie wiem która " +
      "jest godzina. pracowaliśmy cały dzień i teraz chcemy iść do " +
      "domu. ta książka jest bardzo dobra i chciałbym przeczytać ją " +
      "jeszcze raz. dokąd idziesz jutro rano. powiedziała że nie może " +
      "przyjść ponieważ ma za dużo pracy. ludzie powinni zawsze sobie " +
      "pomagać. miasto ma wiele ulic i wiele starych budynków. jak się " +
      "nazywasz i gdzie mieszkasz. padało całą noc ale teraz świeci " +
      "słońce."),
    "cs" -> ("všichni lidé rodí se svobodní a sobě rovní co do důstojnosti a " +
      "práv. jsou nadáni rozumem a svědomím a mají spolu jednat v duchu " +
      "bratrství. počasí je dnes pěkné a děti si hrají na zahradě se " +
      "svými přáteli. dům je velký a voda je studená. nevím kolik je " +
      "hodin. pracovali jsme celý den a teď chceme jít domů. tato kniha " +
      "je velmi dobrá a chtěl bych si ji přečíst ještě jednou. kam jdeš " +
      "zítra ráno. řekla že nemůže přijít protože má příliš mnoho " +
      "práce. lidé by si měli vždy pomáhat. město má mnoho ulic a mnoho " +
      "starých budov. jak se jmenuješ a kde bydlíš. celou noc pršelo " +
      "ale teď svítí slunce."),
    "ro" -> ("toate ființele umane se nasc libere și egale în demnitate și în " +
      "drepturi. ele sunt înzestrate cu rațiune și conștiință și " +
      "trebuie să se comporte unele față de altele în spiritul " +
      "fraternității. vremea este frumoasă astăzi și copiii se joacă în " +
      "grădină cu prietenii lor. casa este mare și apa este rece. nu " +
      "știu cât este ceasul. am muncit toată ziua și acum vrem să " +
      "mergem acasă. această carte este foarte bună și aș vrea să o " +
      "citesc din nou. unde mergi mâine dimineață. ea a spus că nu " +
      "poate veni pentru că are prea multă muncă. oamenii ar trebui să " +
      "se ajute mereu unii pe alții. orașul are multe străzi și multe " +
      "clădiri vechi. cum te numești și unde locuiești. a plouat toată " +
      "noaptea dar acum strălucește soarele."),
    "tr" -> ("bütün insanlar hür, haysiyet ve haklar bakımından eşit doğarlar. " +
      "akıl ve vicdana sahiptirler ve birbirlerine karşı kardeşlik " +
      "zihniyeti ile hareket etmelidirler. bugün hava güzel ve çocuklar " +
      "bahçede arkadaşlarıyla oynuyorlar. ev büyük ve su soğuk. saatin " +
      "kaç olduğunu bilmiyorum. bütün gün çalıştık ve şimdi eve gitmek " +
      "istiyoruz. bu kitap çok güzel ve onu tekrar okumak istiyorum. " +
      "yarın sabah nereye gidiyorsun. çok işi olduğu için " +
      "gelemeyeceğini söyledi. insanlar her zaman birbirlerine yardım " +
      "etmelidir. şehirde birçok sokak ve birçok eski bina var. adın ne " +
      "ve nerede oturuyorsun. bütün gece yağmur yağdı ama şimdi güneş " +
      "parlıyor."),
    "id" -> ("semua orang dilahirkan merdeka dan mempunyai martabat dan hak " +
      "yang sama. mereka dikaruniai akal dan hati nurani dan hendaknya " +
      "bergaul satu sama lain dalam semangat persaudaraan. cuaca hari " +
      "ini bagus dan anak anak sedang bermain di kebun dengan teman " +
      "teman mereka. rumah itu besar dan airnya dingin. saya tidak tahu " +
      "jam berapa sekarang. kami sudah bekerja sepanjang hari dan " +
      "sekarang kami ingin pulang. buku ini sangat bagus dan saya ingin " +
      "membacanya lagi. kamu mau pergi ke mana besok pagi. dia berkata " +
      "bahwa dia tidak bisa datang karena dia punya terlalu banyak " +
      "pekerjaan. orang orang harus selalu saling membantu. kota ini " +
      "punya banyak jalan dan banyak gedung tua. siapa namamu dan di " +
      "mana kamu tinggal. hujan turun sepanjang malam tetapi sekarang " +
      "matahari bersinar."),
    "ru" -> ("все люди рождаются свободными и равными в своем достоинстве и " +
      "правах. они наделены разумом и совестью и должны поступать в " +
      "отношении друг друга в духе братства. сегодня хорошая погода и " +
      "дети играют в саду со своими друзьями. дом большой и вода " +
      "холодная. я не знаю который час. мы работали весь день и теперь " +
      "хотим пойти домой. эта книга очень хорошая и я хотел бы " +
      "прочитать её ещё раз. куда ты идёшь завтра утром. она сказала " +
      "что не может прийти потому что у неё слишком много работы. люди " +
      "должны всегда помогать друг другу. в городе много улиц и много " +
      "старых зданий. как тебя зовут и где ты живёшь. всю ночь шёл " +
      "дождь но теперь светит солнце."),
    "el" -> ("όλοι οι άνθρωποι γεννιούνται ελεύθεροι και ίσοι στην αξιοπρέπεια " +
      "και τα δικαιώματα. είναι προικισμένοι με λογική και συνείδηση " +
      "και οφείλουν να συμπεριφέρονται μεταξύ τους με πνεύμα " +
      "αδελφοσύνης. ο καιρός είναι ωραίος σήμερα και τα παιδιά παίζουν " +
      "στον κήπο με τους φίλους τους. το σπίτι είναι μεγάλο και το νερό " +
      "είναι κρύο. δεν ξέρω τι ώρα είναι. δουλέψαμε όλη μέρα και τώρα " +
      "θέλουμε να πάμε σπίτι. αυτό το βιβλίο είναι πολύ καλό και θα " +
      "ήθελα να το διαβάσω ξανά. πού πηγαίνεις αύριο το πρωί. είπε ότι " +
      "δεν μπορούσε να έρθει επειδή είχε πάρα πολλή δουλειά. οι " +
      "άνθρωποι πρέπει πάντα να βοηθούν ο ένας τον άλλον. η πόλη έχει " +
      "πολλούς δρόμους και πολλά παλιά κτίρια. πώς σε λένε και πού " +
      "μένεις. έβρεχε όλη τη νύχτα αλλά τώρα λάμπει ο ήλιος."))

  /** Character n-gram size (code points). */
  val N: Int = 4

  /** Grams kept per language — the head of the Zipf curve deep enough
    * to separate close pairs (sv/da, es/pt) on one sentence of input,
    * still a trivially-broadcast driver literal at 16 × 300 grams. */
  val TopK: Int = 300

  private val NonLetter = java.util.regex.Pattern.compile("[^\\p{L}]+")

  /** The shared normalization — driver trainer, Spark kernel, and SQL
    * oracle must all apply exactly this: lowercase, collapse every
    * non-letter run to one space, pad one space each side (so
    * word-boundary grams like `" the"` / `"he "` are counted). */
  def normalize(s: String): String =
    " " + NonLetter.matcher(s.toLowerCase(java.util.Locale.ROOT))
      .replaceAll(" ") + " "

  /** Train rank-weight n-gram profiles from seed texts on the driver:
    * count code-point [[N]]-grams of the normalized text, keep the topK
    * by (count desc, gram asc), weight rank r as `topK − r + 1`. Pure
    * integer arithmetic — any engine retrains to identical literals. */
  def trainProfiles(
      samples: Seq[(String, String)] = Samples,
      topK: Int = TopK,
      n: Int = N): IndexedSeq[(String, IndexedSeq[(String, Long)])] =
    samples.toIndexedSeq.map { case (lang, text) =>
      val t = normalize(text)
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      val cps = t.codePoints().toArray
      var i = 0
      while (i + n - 1 < cps.length) {
        val g = new String(cps, i, n)
        counts(g) = counts.getOrElse(g, 0L) + 1L
        i += 1
      }
      val top = counts.toSeq
        .sortBy { case (g, c) => (-c, g) }
        .take(topK)
      lang -> top.zipWithIndex
        .map { case ((g, _), r) => g -> (topK - r).toLong }
        .toIndexedSeq
    }

  /** The default 16-language profile table, trained once per JVM. */
  lazy val Default: IndexedSeq[(String, IndexedSeq[(String, Long)])] =
    trainProfiles()

  /** Language order of [[Default]] — the argmax tie order. */
  lazy val Langs: IndexedSeq[String] = Default.map(_._1)
}

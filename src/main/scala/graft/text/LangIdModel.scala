package graft.text

import org.apache.spark.unsafe.types.UTF8String

/** Character-trigram naive-Bayes language identification over 20
  * languages — the real replacement for the round-5 marker-word
  * heuristic (which knew 5 languages and failed on any sentence missing
  * its markers).
  *
  * Model: per language, a trigram evidence table built ONCE per JVM
  * from embedded public-text samples (UDHR article 1 plus composed
  * everyday-language samples per language — under a kilobyte each, no
  * external data files). Scoring is centered naive Bayes:
  * `score(l) = Σ_t count_text(t) · [log p_l(t) − log p_l(unseen)]`,
  * which algebraically reduces to `Σ_t count_text(t) · log(1 + c_l(t)/α)`
  * — POSITIVE EVIDENCE only, exactly zero for a language that has never
  * seen the trigram. The centering makes the score independent of each
  * language's profile length (plain NB floors favor the language with
  * the SMALLEST profile on out-of-vocabulary text — compact CJK samples
  * made Chinese swallow kanji-heavy Japanese). Highest score wins; ties
  * (e.g. empty text) fall to declared order, so the result is fully
  * deterministic.
  *
  * Text normalization: lowercase, every non-letter folded to a space,
  * runs collapsed, ends padded — so trigrams capture function-word
  * boundaries (" de", "de ", …), the strongest language signal.
  * Trigrams are packed 3×16-bit chars into a Long (BMP chars, which
  * covers the embedded profiles; astral chars fold via toChar
  * consistently on both build and predict).
  *
  * Scale posture: the table is a plain JVM static (~3k entries) — each
  * executor builds it once lazily; prediction is one pass over the
  * string with a HashMap probe per trigram, invoked from generated code
  * (see [[graft.functions.LangId]]) — no serialization, no broadcast
  * needed, no per-row allocation beyond the score array.
  */
object LangIdModel {

  /** Declared order = tie-break order (new languages append at the end
    * so the original 14's tie-break order never shifts). */
  val Languages: IndexedSeq[String] = IndexedSeq(
    "en", "es", "de", "fr", "it", "pt", "nl", "sv", "pl", "tr",
    "ru", "ar", "zh", "ja", "vi", "th", "hi", "ko", "el", "he")

  // Embedded profile samples: UDHR article 1 (public domain) + one
  // composed everyday sentence-cluster per language.
  private val Samples: Map[String, Seq[String]] = Map(
    "en" -> Seq(
      "All human beings are born free and equal in dignity and rights. They are endowed with reason and conscience and should act towards one another in a spirit of brotherhood.",
      "The quick brown fox jumps over the lazy dog while the children watch the morning light from the old wooden bridge near the river.",
      "I do not know what they want, but we will see them when they come back home tomorrow.",
      "There are many people who think that this is not a good idea, and I can understand why they would say so.",
      "The train leaves in the morning and arrives in the big city late in the evening."),
    "es" -> Seq(
      "Todos los seres humanos nacen libres e iguales en dignidad y derechos y, dotados como están de razón y conciencia, deben comportarse fraternalmente los unos con los otros.",
      "La casa blanca está cerca de la playa y los niños juegan en el jardín con una pelota roja durante las tardes de verano.",
      "No sé lo que quieren, pero los veremos cuando vuelvan mañana a casa.",
      "Hay mucha gente que piensa que esto no es una buena idea, y puedo entender por qué lo dicen.",
      "¿Dónde está el mercado? Está muy lejos de aquí, tienes que tomar el autobús por la ciudad."),
    "de" -> Seq(
      "Alle Menschen sind frei und gleich an Würde und Rechten geboren. Sie sind mit Vernunft und Gewissen begabt und sollen einander im Geist der Brüderlichkeit begegnen.",
      "Das Wetter ist heute schön und die Kinder spielen im Garten, während die Mutter in der Küche das Abendessen für die ganze Familie kocht.",
      "Ich weiß nicht, was sie wollen, aber wir werden sie sehen, wenn sie morgen nach Hause zurückkommen.",
      "Es gibt viele Leute, die denken, dass das keine gute Idee ist, und ich kann verstehen, warum sie das sagen.",
      "Der Zug fährt am Morgen ab und kommt am Abend in der großen Stadt an, wo er lange hält."),
    "fr" -> Seq(
      "Tous les êtres humains naissent libres et égaux en dignité et en droits. Ils sont doués de raison et de conscience et doivent agir les uns envers les autres dans un esprit de fraternité.",
      "Le petit garçon mange une pomme rouge dans le jardin pendant que sa mère prépare le dîner pour toute la famille ce soir.",
      "Je ne sais pas ce qu'ils veulent, mais nous les verrons quand ils rentreront demain à la maison.",
      "Il y a beaucoup de gens qui pensent que ce n'est pas une bonne idée, et je peux comprendre pourquoi ils le disent.",
      "Le train part le matin et arrive le soir dans la grande ville, où il reste longtemps."),
    "it" -> Seq(
      "Tutti gli esseri umani nascono liberi ed eguali in dignità e diritti. Essi sono dotati di ragione e di coscienza e devono agire gli uni verso gli altri in spirito di fratellanza.",
      "Il ragazzo mangia una mela rossa nel giardino mentre sua madre prepara la cena per tutta la famiglia questa sera d'estate.",
      "Non so cosa vogliono, ma li vedremo quando torneranno a casa domani.",
      "Ci sono molte persone che pensano che questa non sia una buona idea, e posso capire perché lo dicono.",
      "Il treno parte la mattina e arriva la sera nella grande città, dove rimane a lungo."),
    "pt" -> Seq(
      "Todos os seres humanos nascem livres e iguais em dignidade e em direitos. Dotados de razão e de consciência, devem agir uns para com os outros em espírito de fraternidade.",
      "O menino come uma maçã vermelha no jardim enquanto a sua mãe prepara o jantar para toda a família nesta noite de verão.",
      "Não sei o que eles querem, mas vamos vê-los quando voltarem amanhã para casa.",
      "Há muitas pessoas que acham que isto não é uma boa ideia, e eu posso entender porque o dizem.",
      "Onde fica o mercado? É muito longe daqui, você tem que apanhar o autocarro pela cidade."),
    "nl" -> Seq(
      "Alle mensen worden vrij en gelijk in waardigheid en rechten geboren. Zij zijn begiftigd met verstand en geweten, en behoren zich jegens elkander in een geest van broederschap te gedragen.",
      "Het weer is vandaag mooi en de kinderen spelen in de tuin terwijl moeder in de keuken het avondeten voor het hele gezin kookt.",
      "Ik weet niet wat ze willen, maar we zullen ze zien wanneer ze morgen weer thuiskomen.",
      "Er zijn veel mensen die denken dat dit geen goed idee is, en ik kan begrijpen waarom ze dat zeggen.",
      "De trein vertrekt in de ochtend en komt in de avond aan in de grote stad, waar hij lang blijft staan."),
    "sv" -> Seq(
      "Alla människor är födda fria och lika i värde och rättigheter. De har utrustats med förnuft och samvete och bör handla gentemot varandra i en anda av gemenskap.",
      "Vädret är vackert idag och barnen leker i trädgården medan mamma lagar middag i köket för hela familjen i kväll.",
      "Jag vet inte vad de vill, men vi kommer att se dem när de kommer hem igen i morgon.",
      "Det finns många människor som tycker att det här inte är en bra idé, och jag kan förstå varför de säger det.",
      "Tåget avgår på morgonen och kommer fram till den stora staden på kvällen, där det står länge.",
      "Han arbetar på ett stort kontor som ligger inte långt från vårt gamla hus på andra sidan gatan."),
    "pl" -> Seq(
      "Wszyscy ludzie rodzą się wolni i równi pod względem swej godności i swych praw. Są oni obdarzeni rozumem i sumieniem i powinni postępować wobec innych w duchu braterstwa.",
      "Pogoda jest dzisiaj piękna i dzieci bawią się w ogrodzie, podczas gdy matka gotuje obiad w kuchni dla całej rodziny.",
      "Nie wiem, czego chcą, ale zobaczymy ich, kiedy jutro wrócą do domu.",
      "Jest wielu ludzi, którzy myślą, że to nie jest dobry pomysł, i rozumiem, dlaczego tak mówią.",
      "Pociąg odjeżdża rano i przyjeżdża wieczorem do dużego miasta, gdzie stoi bardzo długo."),
    "tr" -> Seq(
      "Bütün insanlar hür, haysiyet ve haklar bakımından eşit doğarlar. Akıl ve vicdana sahiptirler ve birbirlerine karşı kardeşlik zihniyeti ile hareket etmelidirler.",
      "Bugün hava çok güzel ve çocuklar bahçede oynuyor, anne ise mutfakta bütün aile için akşam yemeği hazırlıyor.",
      "Ne istediklerini bilmiyorum ama yarın eve döndüklerinde onları göreceğiz.",
      "Bunun iyi bir fikir olmadığını düşünen çok insan var ve neden öyle söylediklerini anlayabiliyorum.",
      "Tren sabah kalkıyor ve akşam büyük şehre varıyor, orada uzun süre bekliyor."),
    "ru" -> Seq(
      "Все люди рождаются свободными и равными в своем достоинстве и правах. Они наделены разумом и совестью и должны поступать в отношении друг друга в духе братства.",
      "Сегодня хорошая погода, дети играют в саду, а мама готовит ужин на кухне для всей семьи этим тёплым летним вечером.",
      "Я не знаю, чего они хотят, но мы увидим их, когда они вернутся домой завтра.",
      "Есть много людей, которые думают, что это плохая идея, и я понимаю, почему они так говорят.",
      "Поезд отправляется утром и прибывает в большой город вечером, где долго стоит."),
    "ar" -> Seq(
      "يولد جميع الناس أحرارا متساوين في الكرامة والحقوق وقد وهبوا عقلا وضميرا وعليهم أن يعامل بعضهم بعضا بروح الإخاء",
      "الطقس جميل اليوم والأطفال يلعبون في الحديقة بينما تعد الأم العشاء في المطبخ لجميع أفراد العائلة هذا المساء",
      "لا أعرف ماذا يريدون ولكننا سنراهم عندما يعودون إلى المنزل غدا",
      "هناك كثير من الناس الذين يعتقدون أن هذه ليست فكرة جيدة وأنا أفهم لماذا يقولون ذلك",
      "يغادر القطار في الصباح ويصل إلى المدينة الكبيرة في المساء حيث يتوقف طويلا"),
    "zh" -> Seq(
      "人人生而自由，在尊严和权利上一律平等。他们赋有理性和良心，并应以兄弟关系的精神相对待。",
      "今天天气很好，孩子们在花园里玩耍，妈妈在厨房里为全家人准备晚饭，大家都很开心。",
      "我不知道他们想要什么，但是他们明天回家的时候我们会见到他们。",
      "有很多人认为这不是一个好主意，我能理解他们为什么这么说。",
      "火车早上出发，晚上到达大城市，在那里停留很长时间。"),
    "ja" -> Seq(
      "すべての人間は、生まれながらにして自由であり、かつ、尊厳と権利とについて平等である。人間は、理性と良心とを授けられており、互いに同胞の精神をもって行動しなければならない。",
      "今日は天気がとても良くて、子供たちは庭で遊んでいて、母は台所で家族みんなのために夕食を作っています。",
      "私は彼らが何を欲しいのか分かりませんが、明日家に帰ってきたときに会えるでしょう。",
      "これは良い考えではないと思う人がたくさんいますが、なぜそう言うのか私には理解できます。",
      "電車は朝に出発して、夜に大きな町に着きます。そこで長いあいだ止まっています。"),
    "vi" -> Seq(
      "Tất cả mọi người sinh ra đều được tự do và bình đẳng về nhân phẩm và quyền lợi. Mọi con người đều được tạo hóa ban cho lý trí và lương tâm và cần phải đối xử với nhau trong tình anh em.",
      "Hôm nay thời tiết rất đẹp, trẻ em chơi trong vườn trong khi mẹ nấu bữa tối trong bếp cho cả gia đình.",
      "Tôi không biết họ muốn gì, nhưng chúng ta sẽ gặp họ khi họ về nhà vào ngày mai.",
      "Có nhiều người nghĩ rằng đây không phải là một ý kiến hay, và tôi có thể hiểu tại sao họ nói như vậy.",
      "Chuyến tàu khởi hành vào buổi sáng và đến thành phố lớn vào buổi tối, nơi nó dừng lại rất lâu."),
    "th" -> Seq(
      "มนุษย์ทั้งปวงเกิดมามีอิสระและเสมอภาคกันในศักดิ์ศรีและสิทธิ ต่างในตนมีเหตุผลและมโนธรรม และควรปฏิบัติต่อกันด้วยจิตวิญญาณแห่งภราดรภาพ",
      "วันนี้อากาศดีมาก เด็กๆ กำลังเล่นอยู่ในสวน ขณะที่แม่กำลังทำอาหารเย็นในครัวให้ทั้งครอบครัว",
      "ฉันไม่รู้ว่าพวกเขาต้องการอะไร แต่เราจะได้พบพวกเขาเมื่อพวกเขากลับบ้านพรุ่งนี้",
      "มีคนจำนวนมากที่คิดว่านี่ไม่ใช่ความคิดที่ดี และฉันเข้าใจว่าทำไมพวกเขาจึงพูดอย่างนั้น",
      "รถไฟออกเดินทางตอนเช้าและถึงเมืองใหญ่ในตอนเย็น และจอดอยู่ที่นั่นเป็นเวลานาน"),
    "hi" -> Seq(
      "सभी मनुष्यों को गौरव और अधिकारों के मामले में जन्मजात स्वतन्त्रता और समानता प्राप्त है। उन्हें बुद्धि और अन्तरात्मा की देन प्राप्त है और परस्पर उन्हें भाईचारे के भाव से बर्ताव करना चाहिए।",
      "आज मौसम बहुत अच्छा है और बच्चे बगीचे में खेल रहे हैं जबकि माँ रसोई में पूरे परिवार के लिए रात का खाना बना रही है।",
      "मुझे नहीं पता कि वे क्या चाहते हैं, लेकिन जब वे कल घर लौटेंगे तो हम उनसे मिलेंगे।",
      "बहुत से लोग सोचते हैं कि यह अच्छा विचार नहीं है, और मैं समझ सकता हूँ कि वे ऐसा क्यों कहते हैं।",
      "रेलगाड़ी सुबह निकलती है और शाम को बड़े शहर पहुँचती है, जहाँ वह बहुत देर तक रुकती है।"),
    "ko" -> Seq(
      "모든 인간은 태어날 때부터 자유로우며 그 존엄과 권리에 있어 동등하다. 인간은 천부적으로 이성과 양심을 부여받았으며 서로 형제애의 정신으로 행동하여야 한다.",
      "오늘은 날씨가 정말 좋고 아이들은 정원에서 놀고 있으며 어머니는 부엌에서 온 가족을 위해 저녁을 준비하고 있다.",
      "나는 그들이 무엇을 원하는지 모르지만 내일 집에 돌아오면 우리는 그들을 만날 것이다.",
      "이것이 좋은 생각이 아니라고 생각하는 사람이 많이 있고, 왜 그렇게 말하는지 이해할 수 있다.",
      "기차는 아침에 출발해서 저녁에 큰 도시에 도착하고 그곳에서 오랫동안 머무른다."),
    "el" -> Seq(
      "Όλοι οι άνθρωποι γεννιούνται ελεύθεροι και ίσοι στην αξιοπρέπεια και τα δικαιώματα. Είναι προικισμένοι με λογική και συνείδηση, και οφείλουν να συμπεριφέρονται μεταξύ τους με πνεύμα αδελφοσύνης.",
      "Ο καιρός είναι πολύ ωραίος σήμερα και τα παιδιά παίζουν στον κήπο ενώ η μητέρα ετοιμάζει το βραδινό στην κουζίνα για όλη την οικογένεια.",
      "Δεν ξέρω τι θέλουν, αλλά θα τους δούμε όταν γυρίσουν σπίτι αύριο.",
      "Υπάρχουν πολλοί άνθρωποι που πιστεύουν ότι αυτή δεν είναι καλή ιδέα, και μπορώ να καταλάβω γιατί το λένε.",
      "Το τρένο φεύγει το πρωί και φτάνει το βράδυ στη μεγάλη πόλη, όπου μένει πολλή ώρα."),
    "he" -> Seq(
      "כל בני האדם נולדו בני חורין ושווים בערכם ובזכויותיהם. כולם חוננו בתבונה ובמצפון, לפיכך חובה עליהם לנהוג איש ברעהו ברוח של אחווה.",
      "מזג האוויר יפה מאוד היום והילדים משחקים בגינה בזמן שאמא מכינה ארוחת ערב במטבח לכל המשפחה.",
      "אני לא יודע מה הם רוצים, אבל נראה אותם כשהם יחזרו הביתה מחר.",
      "יש הרבה אנשים שחושבים שזה לא רעיון טוב, ואני יכול להבין למה הם אומרים את זה.",
      "הרכבת יוצאת בבוקר ומגיעה לעיר הגדולה בערב, ושם היא עוצרת לזמן רב."))

  /** Held-out evaluation sentences per language — share NO sentence with
    * the profiles (many share no content word at all); the fixture the
    * driver's langid query classifies, and the spec's accuracy set. */
  val Holdout: Map[String, IndexedSeq[String]] = Map(
    "en" -> IndexedSeq(
      "She walked to the station early in the morning to catch the first train into the city.",
      "We have been waiting for hours, but the letter still has not arrived.",
      "My brother works at a small bookshop around the corner from our house."),
    "es" -> IndexedSeq(
      "Ella caminó hasta la estación por la mañana para tomar el primer tren hacia la ciudad.",
      "Hemos esperado durante horas, pero la carta todavía no ha llegado.",
      "Mi hermano trabaja en una pequeña librería cerca de nuestra casa."),
    "de" -> IndexedSeq(
      "Er ging gestern früh zum Bahnhof, um den ersten Zug in die Stadt zu nehmen.",
      "Wir haben stundenlang gewartet, aber der Brief ist immer noch nicht angekommen.",
      "Mein Bruder arbeitet in einer kleinen Buchhandlung gleich um die Ecke."),
    "fr" -> IndexedSeq(
      "Elle a marché jusqu'à la gare tôt le matin pour prendre le premier train vers la ville.",
      "Nous avons attendu pendant des heures, mais la lettre n'est toujours pas arrivée.",
      "Mon frère travaille dans une petite librairie au coin de notre rue."),
    "it" -> IndexedSeq(
      "È andata alla stazione presto la mattina per prendere il primo treno verso la città.",
      "Abbiamo aspettato per ore, ma la lettera non è ancora arrivata.",
      "Mio fratello lavora in una piccola libreria dietro l'angolo di casa nostra."),
    "pt" -> IndexedSeq(
      "Ela caminhou até a estação de manhã cedo para apanhar o primeiro comboio para a cidade.",
      "Esperámos durante horas, mas a carta ainda não chegou.",
      "O meu irmão trabalha numa pequena livraria ao virar da esquina da nossa casa."),
    "nl" -> IndexedSeq(
      "Ze liep vanochtend vroeg naar het station om de eerste trein naar de stad te nemen.",
      "We hebben urenlang gewacht, maar de brief is nog steeds niet aangekomen.",
      "Mijn broer werkt in een kleine boekwinkel om de hoek bij ons huis."),
    "sv" -> IndexedSeq(
      "Hon gick till stationen tidigt på morgonen för att hinna med första tåget in till staden.",
      "Vi har väntat i flera timmar, men brevet har fortfarande inte kommit.",
      "Min bror arbetar i en liten bokhandel runt hörnet från vårt hus."),
    "pl" -> IndexedSeq(
      "Poszła rano na dworzec, żeby zdążyć na pierwszy pociąg do miasta.",
      "Czekaliśmy godzinami, ale list wciąż nie nadszedł.",
      "Mój brat pracuje w małej księgarni za rogiem naszego domu."),
    "tr" -> IndexedSeq(
      "Sabah erkenden istasyona yürüdü ve şehre giden ilk trene bindi.",
      "Saatlerce bekledik ama mektup hala gelmedi.",
      "Kardeşim evimizin köşesindeki küçük bir kitapçıda çalışıyor."),
    "ru" -> IndexedSeq(
      "Она пошла на вокзал рано утром, чтобы успеть на первый поезд в город.",
      "Мы ждали несколько часов, но письмо так и не пришло.",
      "Мой брат работает в маленьком книжном магазине за углом нашего дома."),
    "ar" -> IndexedSeq(
      "ذهبت إلى المحطة في الصباح الباكر لتلحق بأول قطار إلى المدينة",
      "انتظرنا لساعات طويلة لكن الرسالة لم تصل بعد",
      "يعمل أخي في مكتبة صغيرة قريبة من منزلنا"),
    "zh" -> IndexedSeq(
      "她一大早走到车站，赶上了开往城里的第一班火车。",
      "我们等了好几个小时，可是信还是没有到。",
      "我哥哥在我们家附近的一家小书店工作。"),
    "ja" -> IndexedSeq(
      "彼女は朝早く駅まで歩いて、町へ行く最初の電車に乗りました。",
      "何時間も待ちましたが、手紙はまだ届いていません。",
      "兄は家の近くの小さな本屋で働いています。"),
    "vi" -> IndexedSeq(
      "Cô ấy đi bộ đến nhà ga từ sáng sớm để kịp chuyến tàu đầu tiên vào thành phố.",
      "Chúng tôi đã chờ nhiều giờ, nhưng lá thư vẫn chưa đến.",
      "Anh trai tôi làm việc trong một hiệu sách nhỏ gần nhà chúng tôi."),
    "th" -> IndexedSeq(
      "เธอเดินไปที่สถานีแต่เช้าตรู่เพื่อให้ทันรถไฟขบวนแรกเข้าเมือง",
      "เรารอกันหลายชั่วโมงแล้ว แต่จดหมายก็ยังมาไม่ถึง",
      "พี่ชายของฉันทำงานในร้านหนังสือเล็กๆ ใกล้บ้านของเรา"),
    "hi" -> IndexedSeq(
      "वह सुबह जल्दी स्टेशन तक पैदल गई ताकि शहर जाने वाली पहली रेलगाड़ी पकड़ सके।",
      "हमने घंटों इंतज़ार किया, लेकिन चिट्ठी अभी तक नहीं पहुँची।",
      "मेरा भाई हमारे घर के पास एक छोटी किताबों की दुकान में काम करता है।"),
    "ko" -> IndexedSeq(
      "그녀는 도시로 가는 첫 기차를 타기 위해 아침 일찍 역까지 걸어갔다.",
      "우리는 몇 시간 동안 기다렸지만 편지는 아직 도착하지 않았다.",
      "내 형은 우리 집 근처의 작은 책방에서 일한다."),
    "el" -> IndexedSeq(
      "Περπάτησε στον σταθμό νωρίς το πρωί για να προλάβει το πρώτο τρένο για την πόλη.",
      "Περιμέναμε ώρες, αλλά το γράμμα δεν έχει φτάσει ακόμα.",
      "Ο αδερφός μου δουλεύει σε ένα μικρό βιβλιοπωλείο στη γωνία του σπιτιού μας."),
    "he" -> IndexedSeq(
      "היא הלכה לתחנה מוקדם בבוקר כדי להספיק לרכבת הראשונה אל העיר.",
      "חיכינו שעות, אבל המכתב עדיין לא הגיע.",
      "אחי עובד בחנות ספרים קטנה ליד הבית שלנו."))

  /** Sentences per language in [[Holdout]] (fixture arithmetic). */
  val HoldoutK: Int = 3

  private val Alpha = 0.5

  // ---- model build (once per JVM, ~3k trigrams) -----------------------

  private def pack(a: Char, b: Char, c: Char): Long =
    (a.toLong << 32) | (b.toLong << 16) | c.toLong

  /** Lowercase, non-letters → space, collapse runs, pad ends. */
  private def normalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append(' ')
    var prevSpace = true
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (Character.isLetter(ch)) {
        sb.append(Character.toLowerCase(ch)); prevSpace = false
      } else if (!prevSpace) { sb.append(' '); prevSpace = true }
      i += 1
    }
    if (!prevSpace) sb.append(' ')
    sb.toString
  }

  /** CJK ideographs + kana: character n-grams this short are only
    * meaningful for scripts where one glyph ≈ one morpheme. */
  private def isCjk(c: Char): Boolean =
    (c >= '⺀' && c <= '鿿') || (c >= '豈' && c <= '﫿')

  /** Emit every feature of `s`: char trigrams everywhere, plus unigrams
    * and bigrams for CJK runs (trigrams are too sparse for compact CJK
    * text — a 30-character Chinese sentence shares almost no trigram
    * with a small profile, but shares many characters). Feature ids are
    * tag-disambiguated in the high bits so kinds never collide. */
  private def eachFeature(s: String)(f: Long => Unit): Unit = {
    val n = normalize(s)
    var i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      if (i + 2 < n.length)
        f(pack(c, n.charAt(i + 1), n.charAt(i + 2)))
      if (isCjk(c)) {
        f(c.toLong | (1L << 62))
        if (i + 1 < n.length && isCjk(n.charAt(i + 1)))
          f(pack(' ', c, n.charAt(i + 1)) | (1L << 61))
      }
      i += 1
    }
  }

  private val table: java.util.HashMap[Long, Array[Double]] = {
    val nLangs = Languages.length
    val counts = Array.fill(nLangs)(new java.util.HashMap[Long, Int]())
    val vocab = new java.util.HashSet[Long]()
    Languages.zipWithIndex.foreach { case (lang, li) =>
      Samples(lang).foreach(s => eachFeature(s) { t =>
        counts(li).merge(t, 1, Integer.sum)
        vocab.add(t)
      })
    }
    val tab = new java.util.HashMap[Long, Array[Double]](vocab.size * 2)
    vocab.forEach { t =>
      val row = Array.tabulate(nLangs) { li =>
        val c = counts(li).getOrDefault(t, 0)
        if (c == 0) 0.0 else math.log(1.0 + c / Alpha)
      }
      tab.put(t, row)
    }
    tab
  }

  // ---- prediction -----------------------------------------------------

  /** Best language for `s`: naive-Bayes argmax, declared-order
    * tie-break; text with no letter trigrams (empty/degenerate) falls to
    * the first declared language ("en"). */
  def predict(s: String): String = {
    val n = Languages.length
    val scores = new Array[Double](n)
    eachFeature(s) { t =>
      val row = table.get(t)
      if (row != null) { // unseen-everywhere trigrams carry no signal
        var i = 0; while (i < n) { scores(i) += row(i); i += 1 }
      }
    }
    var best = 0
    var i = 1
    while (i < n) { if (scores(i) > scores(best)) best = i; i += 1 }
    Languages(best)
  }

  /** Codegen entry point ([[graft.functions.LangId]]). */
  def predictUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(predict(s.toString))
}

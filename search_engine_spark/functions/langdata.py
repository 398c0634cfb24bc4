"""Deterministic multilingual seed corpus for training the language-ID
n-gram profiles, plus the trained profile table itself.

The sentences are original everyday prose written for this repo (public
knowledge of each language — no external dataset), ~12 training and 5
held-out sentences per language across the same 10 languages the pinned
stand-in profiles covered (de en es fr it nl pt ru pl sv). They exist so
the profiles are TRAINED (Cavnar & Trenkle: rank a language's most
frequent character n-grams) instead of hand-picked lists, with a
held-out split to measure accuracy (tests/test_langid.py asserts it).

``TRAINED_LANG_PROFILES`` is computed at import by the pure-Python twin
of the Spark trainer (``operators/text.py train_lang_profiles``) — a
few hundred short strings, microseconds to count, fully deterministic,
so there is no checked-in generated blob to drift. The Spark trainer on
the same corpus must produce the identical table (pinned ordering:
count desc, gram asc — test_langid.py asserts the parity).
"""

from __future__ import annotations

TRAIN_SENTENCES: dict[str, list[str]] = {
    "de": [
        "der alte mann geht jeden morgen mit seinem hund durch den park",
        "die kinder spielen nach der schule gerne auf dem grossen platz",
        "wir haben gestern abend zusammen ein gutes essen gekocht",
        "das wetter soll am wochenende endlich wieder besser werden",
        "sie liest jeden abend ein paar seiten in ihrem neuen buch",
        "ich muss morgen frueh zur arbeit und danach noch einkaufen",
        "die stadt hat im letzten jahr viele neue wohnungen gebaut",
        "er versteht nicht warum der zug schon wieder verspaetung hat",
        "im sommer fahren wir meistens ans meer oder in die berge",
        "die regierung will die steuern im naechsten jahr senken",
        "unsere nachbarn haben uns zum geburtstag herzlich eingeladen",
        "nach dem langen winter freuen sich alle auf den fruehling",
    ],
    "en": [
        "the old man walks through the park with his dog every morning",
        "the children like to play on the big square after school",
        "we cooked a good dinner together yesterday evening",
        "the weather should finally get better again this weekend",
        "she reads a few pages of her new book every evening",
        "i have to go to work early tomorrow and then buy groceries",
        "the city has built many new apartments during the last year",
        "he does not understand why the train is delayed once again",
        "in summer we usually travel to the sea or to the mountains",
        "the government wants to lower the taxes again next year",
        "our neighbours kindly invited us to their birthday party",
        "after the long winter everyone is looking forward to spring",
    ],
    "es": [
        "el hombre mayor pasea cada manana por el parque con su perro",
        "a los ninos les gusta jugar en la plaza grande despues de clase",
        "anoche preparamos juntos una cena muy buena en casa",
        "el tiempo deberia mejorar por fin este fin de semana",
        "ella lee unas paginas de su libro nuevo todas las noches",
        "manana tengo que ir temprano al trabajo y luego hacer la compra",
        "la ciudad ha construido muchas viviendas nuevas este ano",
        "no entiende por que el tren vuelve a llegar con retraso",
        "en verano solemos viajar al mar o a la montana con la familia",
        "el gobierno quiere bajar los impuestos el proximo ano",
        "nuestros vecinos nos invitaron a su fiesta de cumpleanos",
        "despues del largo invierno todos esperan la primavera",
    ],
    "fr": [
        "le vieil homme promene son chien dans le parc chaque matin",
        "les enfants aiment jouer sur la grande place apres la classe",
        "nous avons prepare ensemble un bon diner hier soir",
        "le temps devrait enfin devenir meilleur ce week-end",
        "elle lit quelques pages de son nouveau livre chaque soir",
        "je dois aller au travail tot demain et ensuite faire les courses",
        "la ville a construit beaucoup de nouveaux logements cette annee",
        "il ne comprend pas pourquoi le train est encore en retard",
        "en ete nous allons souvent a la mer ou a la montagne",
        "le gouvernement veut baisser les impots des la prochaine annee",
        "nos voisins nous ont invites a leur fete d anniversaire",
        "apres ce long hiver tout le monde attend le printemps",
    ],
    "it": [
        "il vecchio signore porta il cane al parco ogni mattina",
        "ai bambini piace giocare nella piazza grande dopo la scuola",
        "ieri sera abbiamo preparato insieme una buona cena",
        "il tempo dovrebbe finalmente migliorare questo fine settimana",
        "lei legge qualche pagina del suo nuovo libro ogni sera",
        "domani devo andare presto al lavoro e poi fare la spesa",
        "la citta ha costruito molte case nuove durante questo anno",
        "non capisce perche il treno sia di nuovo in ritardo",
        "in estate andiamo spesso al mare oppure in montagna",
        "il governo vuole abbassare le tasse gia dal prossimo anno",
        "i nostri vicini ci hanno invitato alla loro festa di compleanno",
        "dopo il lungo inverno tutti aspettano la primavera",
    ],
    "nl": [
        "de oude man wandelt elke ochtend met zijn hond door het park",
        "de kinderen spelen na school graag op het grote plein",
        "wij hebben gisteravond samen een lekker eten gekookt",
        "het weer zou dit weekend eindelijk weer beter moeten worden",
        "zij leest elke avond een paar bladzijden in haar nieuwe boek",
        "ik moet morgen vroeg naar het werk en daarna boodschappen doen",
        "de stad heeft vorig jaar veel nieuwe woningen gebouwd",
        "hij begrijpt niet waarom de trein alweer vertraging heeft",
        "in de zomer gaan we meestal naar zee of naar de bergen",
        "de regering wil de belastingen volgend jaar weer verlagen",
        "onze buren hebben ons hartelijk uitgenodigd voor hun feest",
        "na de lange winter kijkt iedereen uit naar de lente",
    ],
    "pt": [
        "o senhor idoso passeia com o cao pelo parque todas as manhas",
        "as criancas gostam de brincar na praca grande depois da escola",
        "ontem a noite preparamos juntos um jantar muito bom",
        "o tempo deve finalmente melhorar neste fim de semana",
        "ela le algumas paginas do seu livro novo todas as noites",
        "amanha tenho de ir cedo para o trabalho e depois as compras",
        "a cidade construiu muitas casas novas durante este ano",
        "ele nao entende por que o comboio esta outra vez atrasado",
        "no verao costumamos viajar para o mar ou para a montanha",
        "o governo quer baixar os impostos ja no proximo ano",
        "os nossos vizinhos convidaram nos para a festa de aniversario",
        "depois do longo inverno todos esperam pela primavera",
    ],
    "ru": [
        "старый человек каждое утро гуляет с собакой по парку",
        "дети любят играть на большой площади после школы",
        "вчера вечером мы вместе приготовили очень вкусный ужин",
        "погода должна наконец улучшиться в эти выходные",
        "она каждый вечер читает несколько страниц новой книги",
        "завтра мне нужно рано на работу а потом в магазин",
        "город построил много новых домов за последний год",
        "он не понимает почему поезд снова опаздывает",
        "летом мы обычно едем на море или в горы всей семьей",
        "правительство хочет снизить налоги в следующем году",
        "наши соседи пригласили нас на день рождения",
        "после долгой зимы все ждут наступления весны",
    ],
    "pl": [
        "starszy pan codziennie rano spaceruje z psem po parku",
        "dzieci lubia bawic sie na duzym placu po szkole",
        "wczoraj wieczorem ugotowalismy razem bardzo dobra kolacje",
        "pogoda powinna wreszcie poprawic sie w ten weekend",
        "ona czyta co wieczor kilka stron swojej nowej ksiazki",
        "jutro musze wczesnie do pracy a potem zrobic zakupy",
        "miasto zbudowalo w zeszlym roku wiele nowych mieszkan",
        "on nie rozumie dlaczego pociag znowu sie spoznia",
        "latem zwykle jezdzimy nad morze albo w gory z rodzina",
        "rzad chce obnizyc podatki juz w przyszlym roku",
        "nasi sasiedzi zaprosili nas na przyjecie urodzinowe",
        "po dlugiej zimie wszyscy czekaja na wiosne",
    ],
    "sv": [
        "den gamle mannen gar genom parken med sin hund varje morgon",
        "barnen tycker om att leka pa det stora torget efter skolan",
        "vi lagade en god middag tillsammans igar kvall",
        "vadret borde antligen bli battre igen nu i helgen",
        "hon laser nagra sidor i sin nya bok varje kvall",
        "jag maste ga till jobbet tidigt imorgon och sedan handla",
        "staden har byggt manga nya bostader under det senaste aret",
        "han forstar inte varfor taget ar forsenat igen",
        "pa sommaren aker vi oftast till havet eller till bergen",
        "regeringen vill sanka skatterna igen nasta ar",
        "vara grannar bjod in oss till sitt fodelsedagskalas",
        "efter den langa vintern langtar alla efter varen",
    ],
}

HELDOUT_SENTENCES: dict[str, list[str]] = {
    "de": [
        "am bahnhof warten viele menschen auf den letzten zug nach hause",
        "sie moechte im herbst eine lange reise durch europa machen",
        "das kleine cafe an der ecke macht den besten kuchen der stadt",
        "wir treffen uns am freitag mit unseren freunden im garten",
        "der lehrer erklaert den schuelern die schwierige aufgabe noch einmal",
    ],
    "en": [
        "many people are waiting at the station for the last train home",
        "she would like to take a long journey through europe this autumn",
        "the small cafe on the corner makes the best cake in town",
        "we are meeting our friends in the garden on friday",
        "the teacher explains the difficult exercise to the pupils once more",
    ],
    "es": [
        "mucha gente espera en la estacion el ultimo tren a casa",
        "ella quiere hacer un largo viaje por europa este otono",
        "el pequeno cafe de la esquina hace el mejor pastel de la ciudad",
        "el viernes nos reunimos con nuestros amigos en el jardin",
        "el profesor explica otra vez el ejercicio dificil a los alumnos",
    ],
    "fr": [
        "beaucoup de gens attendent a la gare le dernier train du soir",
        "elle voudrait faire un long voyage a travers l europe cet automne",
        "le petit cafe du coin fait le meilleur gateau de la ville",
        "vendredi nous retrouvons nos amis dans le jardin",
        "le professeur explique encore une fois l exercice difficile",
    ],
    "it": [
        "molte persone aspettano in stazione l ultimo treno della sera",
        "lei vorrebbe fare un lungo viaggio per l europa questo autunno",
        "il piccolo bar all angolo prepara la torta migliore della citta",
        "venerdi incontriamo i nostri amici in giardino",
        "il professore spiega ancora una volta l esercizio difficile",
    ],
    "nl": [
        "veel mensen wachten op het station op de laatste trein naar huis",
        "zij wil in de herfst een lange reis door europa maken",
        "het kleine cafe op de hoek maakt de beste taart van de stad",
        "vrijdag ontmoeten wij onze vrienden in de tuin",
        "de leraar legt de moeilijke opdracht nog een keer uit",
    ],
    "pt": [
        "muitas pessoas esperam na estacao o ultimo comboio para casa",
        "ela quer fazer uma longa viagem pela europa neste outono",
        "o pequeno cafe da esquina faz o melhor bolo da cidade",
        "na sexta feira encontramos os nossos amigos no jardim",
        "o professor explica mais uma vez o exercicio dificil",
    ],
    "ru": [
        "много людей ждут на вокзале последний поезд домой",
        "она хочет осенью отправиться в долгое путешествие по европе",
        "маленькое кафе на углу печет лучший пирог в городе",
        "в пятницу мы встречаемся с друзьями в саду",
        "учитель еще раз объясняет ученикам трудное задание",
    ],
    "pl": [
        "wiele osob czeka na dworcu na ostatni pociag do domu",
        "ona chce jesienia wyruszyc w dluga podroz po europie",
        "mala kawiarnia na rogu robi najlepsze ciasto w miescie",
        "w piatek spotykamy sie z przyjaciolmi w ogrodzie",
        "nauczyciel jeszcze raz tlumaczy uczniom trudne zadanie",
    ],
    "sv": [
        "manga manniskor vantar pa stationen pa sista taget hem",
        "hon vill gora en lang resa genom europa i host",
        "det lilla kafeet i hornet gor stadens basta kaka",
        "pa fredag traffar vi vara vanner i tradgarden",
        "lararen forklarar den svara uppgiften en gang till",
    ],
}


def char_ngrams(text: str) -> list[str]:
    """All character bigrams then trigrams of ``text`` lowercased — the
    exact gram stream of ``operators/text.py _NGRAMS_SQL`` (bigrams
    first, then trigrams, both left to right)."""
    t = text.lower()
    out = [t[i : i + 2] for i in range(len(t) - 1)]
    out += [t[i : i + 3] for i in range(len(t) - 2)]
    return out


def train_profiles_py(
    sentences: dict[str, list[str]], n_top: int = 40
) -> dict[str, list[str]]:
    """Pure-Python twin of the Spark ``train_lang_profiles`` operator:
    per language, the ``n_top`` most frequent character n-grams of the
    concatenated gram stream, ranked (count desc, gram asc) — the
    pinned ordering both trainers share."""
    out: dict[str, list[str]] = {}
    for lang in sorted(sentences):
        counts: dict[str, int] = {}
        for s in sentences[lang]:
            for g in char_ngrams(s):
                counts[g] = counts.get(g, 0) + 1
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out[lang] = [g for g, _ in ranked[:n_top]]
    return out


# the trained table the engine ships with (lang_id_ngram's default)
TRAINED_LANG_PROFILES: dict[str, list[str]] = train_profiles_py(
    TRAIN_SENTENCES, n_top=40
)

"""Embedded, deterministic training corpora for the self-built models.

The reference ships no models either — it calls external LLMs or a
local vLLM; our analog of "the model artifact" is a small deterministic
char-n-gram profile built from these public common-word lists (the
fastText/KenLM *style*, not the actual artifacts, which aren't in this
container). Everything is embedded so builds are hermetic and
reproducible (no downloads, no external data).
"""

from __future__ import annotations

# Common-word lists per language (public knowledge). Used to train the
# char-trigram language profiles and the English char-bigram LM.
WORDS: dict[str, list[str]] = {
    "en": """
the of and to in a is that it was for on are as with his they at be this
have from or had by hot word but what some we can out other were all there
when up use your how said an each she which do their time if will way about
many then them write would like so these her long make thing see him two has
look more day could go come did number sound no most people my over know
water than call first who may down side been now find any new work part take
get place made live where after back little only round man year came show
every good me give our under name very through just form sentence great
think say help low line differ turn cause much mean before move right boy
old too same tell does set three want air well also play small end put home
read hand port large spell add even land here must big high such follow act
why ask men change went light kind off need house picture try us again
animal point mother world near build self earth father head stand own page
should country found answer school grow study still learn plant cover food
sun four between state keep eye never last let thought city tree cross farm
hard start might story saw far sea draw left late run while press close
night real life few north open seem together next white children begin got
walk example ease paper group always music those both mark often letter
until mile river car feet care second book carry took science eat room
friend began idea fish mountain stop once base hear horse cut sure watch
color face wood main enough plain girl usual young ready above ever red list
though feel talk bird soon body dog family direct pose leave song measure
door product black short numeral class wind question happen complete ship
area half rock order fire south problem piece told knew pass since top whole
king space heard best hour better true during hundred five remember step
early hold west ground interest reach fast verb sing listen six table travel
less morning ten simple several vowel toward war lay against pattern slow
center love person money serve appear road map rain rule govern pull cold
notice voice unit power town fine certain fly fall lead cry dark machine
note wait plan figure star box noun field rest correct able pound done
beauty drive stood contain front teach week final gave green oh quick
develop ocean warm free minute strong special mind behind clear tail
""".split(),
    "de": """
der die das und in zu den von ist mit sich des auf für nicht eine als auch
es an werden aus er hat dass sie nach wird bei einer um am sind noch wie
einem über einen so zum war haben nur oder aber vor zur bis mehr durch man
sein wurde sei bei ihre dann unter wir soll ich eines jahr zwei jahren
diese dieser wieder keine uns zwischen immer millionen was sagte gegen vom
können schon wenn habe seine mark ihren dann sollen merkel deutschland
anderen wurden kann doch jetzt ihrer damit land denn seit müssen wegen
heute gibt viele dabei deshalb weil menschen sagt waren woche hätte dort
alle würde diesem neuen keine kommen müsse lassen sehr zeit erst ende
leben machen deutsche fall beiden gut dazu etwa drei ganz stadt frau
prozent geht tag weiter könne allerdings bereits frage haus welt weg
gemacht lange stehen kommt selbst worden steht arbeit partei hamburg
platz grossen eigenen frühere stunden möglich mutter ländern danach
""".split(),
    "fr": """
le de un être et à il avoir ne je son que se qui ce dans en du elle au pour
pas sur faire plus dire me on mon lui nous comme mais pouvoir avec tout y
aller voir bien où sans tu ou leur homme si deux mari moi vouloir te femme
venir quand grand celui monde notre devoir là jour prendre même votre rien
petit aussi chose seul donner fois nouveau très autre après chercher heure
vie aimer encore savoir dont contre toujours trois fille alors enfant parler
oui moment très laisser déjà entendre demander peu trouver donc mettre
pendant ami passer beaucoup jamais main oeil premier tête regarder vieux
père ville jeune coeur porte pied doute mieux quelque ainsi personne quatre
puis longtemps table maison partir nuit francs mort entre devant sous
connaître premier répondre corps moins entrer presque suivre pauvre chambre
question raison société livre penser tenir général guerre ouvrir côté eau
""".split(),
    "es": """
el la de que y a en un ser se no haber por con su para como estar tener le
lo todo pero más hacer o poder decir este ir otro ese si me ya ver porque
dar cuando muy sin vez mucho saber qué sobre mi alguno mismo yo también
hasta año dos querer entre así primero desde grande eso ni nos llegar pasar
tiempo ella sí día uno bien poco deber entonces poner cosa tanto hombre
parecer nuestro tan donde ahora parte después vida quedar siempre creer
hablar llevar dejar nada cada seguir menos nuevo encontrar algo solo pues
lugar mundo casa mientras mano tres frente trabajo mujer nunca durante
país según menos agua ciudad luego estado forma noche hora caso muerte
gobierno manera persona número palabra fuerza puerta cabeza razón historia
""".split(),
    "it": """
il di che e la a per non in una è mi si lo ma ho lui cosa le con ti se io
come sono qui no hai più questo sei bene tu da sì del mio solo al tutto me
te era lei della ci un anche perché voglio così noi molto quando fatto essere
loro due anni tempo casa detto altro ancora fare dopo senza giorno prima
stato suo uomo ora grande mondo vita può volta sempre dove mai nulla contro
allora quindi mentre mano parte occhi notte parola padre madre città punto
modo momento esempio acqua terra testa strada signore guerra storia numero
forza paese piazza popolo governo ragione lavoro donna amico cuore porta
""".split(),
}

# English stopwords used by the stopword-density rule (C4/Gopher style).
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "at", "is",
    "are", "was", "were", "be", "been", "it", "that", "this", "with",
    "as", "for", "by", "from", "but", "not", "he", "she", "they", "we",
    "you", "i", "his", "her", "their", "its", "have", "has", "had", "do",
    "will", "would", "can", "could", "there", "what", "which", "who",
    "when", "how", "all", "if", "so", "no", "out", "up", "about", "into",
    "than", "then", "them", "these", "some", "more", "other", "such",
)

"""Language-ID stage: Cavnar–Trenkle trigram classifier + UTF-8 script
routing.  Accuracy is checked on HELD-OUT sentences (disjoint from the
embedded seed text) across 7 Latin-script and 8 non-Latin languages."""
import numpy as np
import pyarrow as pa

from gdal_ray.stages.text import LangId, _LANG_SEED

HELD_OUT = {
    "en": "she opened the letter slowly because the words inside would "
          "tell her whether the journey had been worth all the trouble",
    "de": "er öffnete den brief langsam weil die worte darin ihm sagen "
          "würden ob die reise all die mühe wert gewesen war",
    "fr": "elle a ouvert la lettre lentement parce que les mots qu'elle "
          "contenait lui diraient si le voyage avait valu toute cette peine",
    "es": "ella abrió la carta despacio porque las palabras que contenía "
          "le dirían si el viaje había valido toda la pena",
    "it": "lei ha aperto la lettera lentamente perché le parole che "
          "conteneva le avrebbero detto se il viaggio era valso la fatica",
    "pt": "ela abriu a carta devagar porque as palavras que continha lhe "
          "diriam se a viagem tinha valido toda a pena",
    "nl": "ze opende de brief langzaam omdat de woorden erin haar zouden "
          "vertellen of de reis al die moeite waard was geweest",
    "ru": "она медленно открыла письмо потому что слова внутри сказали бы "
          "ей стоило ли путешествие всех этих хлопот",
    "el": "άνοιξε το γράμμα αργά γιατί οι λέξεις μέσα θα της έλεγαν αν το "
          "ταξίδι άξιζε όλο τον κόπο",
    "ar": "فتحت الرسالة ببطء لأن الكلمات بداخلها ستخبرها إن كانت الرحلة "
          "تستحق كل هذا العناء",
    "he": "היא פתחה את המכתב לאט כי המילים שבו יגידו לה אם המסע היה שווה "
          "את כל הטרחה",
    "zh": "她慢慢打开信因为里面的文字会告诉她这次旅行是否值得所有的辛苦",
    "ja": "彼女はゆっくりと手紙を開けた。中の言葉が、旅の苦労の価値を教えてくれるからだ",
    "ko": "그녀는 편지를 천천히 열었다 안의 글이 여행이 그 모든 수고의 "
          "가치가 있었는지 알려줄 것이기 때문이다",
    "hi": "उसने धीरे से पत्र खोला क्योंकि उसके अंदर के शब्द उसे बताएँगे कि "
          "यात्रा इतनी मेहनत के लायक थी या नहीं",
}


def test_held_out_sentences_all_correct():
    b = pa.table({"doc_id": list(HELD_OUT), "text": list(HELD_OUT.values())})
    out = LangId()(b)
    pred = dict(zip(out.column("doc_id").to_pylist(),
                    out.column("lang_pred").to_pylist()))
    assert pred == {k: k for k in HELD_OUT}


def test_held_out_is_disjoint_from_seed():
    for lang, sent in HELD_OUT.items():
        if lang in _LANG_SEED:
            assert sent not in _LANG_SEED[lang]


def test_deterministic_and_batchable():
    texts = list(HELD_OUT.values()) * 3
    b = pa.table({"doc_id": [str(i) for i in range(len(texts))],
                  "text": texts})
    stage = LangId()
    assert stage(b).equals(stage(b))
    # single-row batches agree with the big batch
    big = stage(b).column("lang_pred").to_pylist()
    for i in (0, 7, 14):
        one = stage(b.slice(i, 1)).column("lang_pred").to_pylist()
        assert one == [big[i]]


def test_und_for_scoreless():
    b = pa.table({"doc_id": ["x", "y"], "text": ["12345 67890", ""]})
    out = LangId()(b).column("lang_pred").to_pylist()
    assert out == ["und", "und"]


def test_profile_built_once_per_actor():
    stage = LangId()
    w1 = stage._W.copy()
    stage(pa.table({"doc_id": ["a"], "text": ["hello there friend"]}))
    assert np.array_equal(stage._W, w1)

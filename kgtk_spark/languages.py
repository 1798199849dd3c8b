"""ISO-639 language-code validation.

Reference: kgtk/value/languagevalidator.py — pycountry/iso639 lookups
plus a table of additional (new or retired) codes. Those lookup
libraries are not in this container, so the code tables are embedded
(they are small, public, and effectively frozen standards):

- the complete ISO 639-1 two-letter set;
- the ISO 639-2/3 three-letter codes for every 639-1 language (both
  bibliographic and terminology variants where they differ) plus the
  ISO 639-5 collective codes commonly seen in Wikidata;
- the reference's DEFAULT_ADDITIONAL_LANGUAGE_CODES (new + retired).

``validate_lang`` mirrors the reference's rules: optional
``-country/dialect`` suffix is split off first; 2-letter codes check
639-1, 3-letter codes check 639-2/3/5, then the additional table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_639_1 = """
aa ab ae af ak am an ar as av ay az ba be bg bh bi bm bn bo br bs ca ce ch co
cr cs cu cv cy da de dv dz ee el en eo es et eu fa ff fi fj fo fr fy ga gd gl
gn gu gv ha he hi ho hr ht hu hy hz ia id ie ig ii ik io is it iu ja jv ka kg
ki kj kk kl km kn ko kr ks ku kv kw ky la lb lg li ln lo lt lu lv mg mh mi mk
ml mn mr ms mt my na nb nd ne ng nl nn no nr nv ny oc oj om or os pa pi pl ps
pt qu rm rn ro ru rw sa sc sd se sg si sk sl sm sn so sq sr ss st su sv sw ta
te tg th ti tk tl tn to tr ts tt tw ty ug uk ur uz ve vi vo wa wo xh yi yo za
zh zu
""".split()

ISO_639_3 = """
aar abk ave afr aka amh arg ara asm ava aym aze bak bel bul bih bis bam ben
bod tib bre bos cat che cha cos cre ces cze chu chv cym wel dan deu ger div
dzo ewe ell gre eng epo spa est eus baq fas per ful fin fij fao fra fre fry
gle gla glg grn guj glv hau heb hin hmo hrv hat hun hye arm her ina ind ile
ibo iii ipk ido isl ice ita iku jpn jav kat geo kon kik kua kaz kal khm kan
kor kau kas kur kom cor kir lat ltz lug lim lin lao lit lub lav mlg mah mri
mao mkd mac mal mon mar msa may mlt mya bur nau nob nde nep ndo nld dut nno
nor nbl nav nya oci oji orm ori oss pan pli pol pus por que roh run ron rum
rus kin san srd snd sme sag sin slk slo slv smo sna som sqi alb srp ssw sot
sun swe swa tam tel tgk tha tir tuk tgl tsn ton tur tso tat twi tah uig ukr
urd uzb ven vie vol wln wol xho yid yor zha zho chi zul
cmn yue wuu arb grc ang enm fro frm gmh goh non ota lzh nan hak
""".split()

# ISO 639-5 collective (language-family) codes seen in Wikidata.
ISO_639_5 = """
afa alg apa art ath aus bad bai bat ber bih bnt btk cai cau cel cmc cpe cpf
cpp crp cus day dra fiu gem ijo inc ine ira iro kar khi kro map mis mkh mno
mul myn nah nai nic nub oto paa phi pra roa sai sal sem sgn sio sit sla smi
son ssa tai tup tut wak wen ypk znd zxx
""".split()

# kgtk/value/languagevalidator.py DEFAULT_ADDITIONAL_LANGUAGE_CODES
DEFAULT_ADDITIONAL_LANGUAGE_CODES = ["cnr", "hyw", "szy", "bh", "mo", "eml"]

KNOWN_LANGUAGE_CODES = frozenset(
    [*ISO_639_1, *ISO_639_3, *ISO_639_5, *DEFAULT_ADDITIONAL_LANGUAGE_CODES]
)


def validate_lang(
    lang: str,
    additional_language_codes: list[str] | None = None,
    allow_language_suffixes: bool = True,
) -> bool:
    """Python-side validator (languagevalidator.py:70-130 semantics)."""
    if allow_language_suffixes and "-" in lang:
        lang = lang.split("-", 1)[0]
    lang = lang.lower()
    if lang in KNOWN_LANGUAGE_CODES:
        # additional codes replace the DEFAULT table when provided
        if additional_language_codes is not None and lang in DEFAULT_ADDITIONAL_LANGUAGE_CODES:
            return (
                lang in ISO_639_1
                or lang in ISO_639_3
                or lang in ISO_639_5
                or lang in additional_language_codes
            )
        return True
    return additional_language_codes is not None and lang in additional_language_codes


def lang_is_valid_col(c: Column) -> Column:
    """JVM predicate: the (suffix-stripped, lowercased) code is known."""
    base = F.lower(F.element_at(F.split(c, "-"), 1))
    return base.isin(sorted(KNOWN_LANGUAGE_CODES))

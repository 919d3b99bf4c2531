"""Character-n-gram language identification (VERDICT r11 stretch):
the Cavnar & Trenkle 1994 out-of-place method ("N-Gram-Based Text
Categorization") as a fully closed-form, oracle-checkable DataFrame
pipeline — the routing layer the reference world fills with a
fasttext-LID model (which stays a plug-in here; see
docs/model_plugins.md). Completes the language-routing stack:
script_fractions routes writing SYSTEMS, the marker-word heuristic
(q_lang_id) separates a few Latin languages, this separates Latin
languages statistically.

Method: a language's profile is its top-K character trigrams ranked by
frequency over a reference sample; a document's profile likewise; the
distance between document and language is the sum over the document's
profile trigrams of the rank displacement |rank_doc - rank_lang|, with
a maximum penalty K for trigrams absent from the language profile.
Lowest distance wins. Everything is integer counts, row_numbers with a
total deterministic tie-break (count DESC, trigram ASC) and absolute
differences — no floats, no model weights, replayable verbatim in SQL.

The LANGUAGE PROFILES are not shipped as trained constants: they are
DERIVED IN-ENGINE from the small self-authored ASCII sample paragraphs
below, through the same trigram-profile pipeline documents go through
— so the Spark query and the DuckDB oracle each build the profiles
from the same 8 string literals and must agree bit-for-bit.

Scale: profile building is over 8 tiny rows; document profiles are one
explode + count + row_number (shuffle keyed by doc); scoring joins the
K-row doc profiles against a BROADCAST 8xK profile table and reduces
— rows moved stay O(docs * K * n_langs) with ~20-byte rows, linear in
corpus size, no Python anywhere."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Self-authored reference paragraphs, one per language, ASCII-only
#: (accents stripped) so collation and lower() agree across engines.
#: Function words dominate trigram profiles, which is what makes ~80
#: words per language enough for the method to separate them.
LANG_SAMPLES: dict[str, str] = {
    "en": ("the quick brown fox jumps over the lazy dog and then the "
           "little children walk to the school because they want to "
           "learn about the world which is full of things that we can "
           "see and hear when the morning comes with the light of the "
           "sun and the people in the town begin their work for the day "
           "while the birds sing in the trees near the river"),
    "de": ("der schnelle braune fuchs springt ueber den faulen hund und "
           "dann gehen die kleinen kinder zur schule weil sie etwas "
           "ueber die welt lernen wollen die voller dinge ist die wir "
           "sehen und hoeren koennen wenn der morgen mit dem licht der "
           "sonne kommt und die menschen in der stadt mit ihrer arbeit "
           "fuer den tag beginnen waehrend die voegel in den baeumen am "
           "fluss singen"),
    "fr": ("le renard brun rapide saute par dessus le chien paresseux "
           "et puis les petits enfants marchent vers l ecole parce qu "
           "ils veulent apprendre des choses sur le monde qui est plein "
           "de choses que nous pouvons voir et entendre quand le matin "
           "arrive avec la lumiere du soleil et les gens de la ville "
           "commencent leur travail pour la journee pendant que les "
           "oiseaux chantent dans les arbres pres de la riviere"),
    "es": ("el rapido zorro marron salta sobre el perro perezoso y "
           "luego los ninos pequenos caminan a la escuela porque "
           "quieren aprender cosas sobre el mundo que esta lleno de "
           "cosas que podemos ver y escuchar cuando llega la manana con "
           "la luz del sol y la gente del pueblo comienza su trabajo "
           "del dia mientras los pajaros cantan en los arboles cerca "
           "del rio"),
    "it": ("la rapida volpe marrone salta sopra il cane pigro e poi i "
           "bambini piccoli camminano verso la scuola perche vogliono "
           "imparare delle cose sul mondo che e pieno di cose che "
           "possiamo vedere e sentire quando arriva il mattino con la "
           "luce del sole e la gente della citta comincia il suo lavoro "
           "per la giornata mentre gli uccelli cantano sugli alberi "
           "vicino al fiume"),
    "pt": ("a rapida raposa marrom salta sobre o cao preguicoso e "
           "depois as criancas pequenas caminham para a escola porque "
           "querem aprender coisas sobre o mundo que esta cheio de "
           "coisas que podemos ver e ouvir quando chega a manha com a "
           "luz do sol e as pessoas da cidade comecam o seu trabalho "
           "do dia enquanto os passaros cantam nas arvores perto do "
           "rio"),
    "nl": ("de snelle bruine vos springt over de luie hond en dan lopen "
           "de kleine kinderen naar school omdat ze iets over de wereld "
           "willen leren die vol is met dingen die we kunnen zien en "
           "horen wanneer de ochtend komt met het licht van de zon en "
           "de mensen in de stad beginnen met hun werk voor de dag "
           "terwijl de vogels zingen in de bomen bij de rivier"),
    "sv": ("den snabba bruna raven hoppar over den lata hunden och "
           "sedan gar de sma barnen till skolan eftersom de vill lara "
           "sig om varlden som ar full av saker som vi kan se och hora "
           "nar morgonen kommer med ljuset fran solen och manniskorna "
           "i staden borjar sitt arbete for dagen medan faglarna "
           "sjunger i traden nara floden"),
}


def normalized_text(text: Column) -> Column:
    """Lowercase, non-letters to spaces, whitespace collapsed, padded
    with one space each side — the canonical form trigrams are drawn
    from (Cavnar-Trenkle tokenize letters only; the pad makes word
    boundaries visible to edge trigrams)."""
    t = F.regexp_replace(F.lower(text), "[^a-z]+", " ")
    return F.concat(F.lit(" "), F.trim(t), F.lit(" "))


def trigrams(text: Column) -> Column:
    """Array of all character trigrams of the NORMALIZED text (the
    normalized string is lambda-bound once — sibling references to an
    unbound expression re-evaluate it per reference, the r10 lesson).
    The length filter drops the junk short grams Spark's sequence(1, 0)
    produces on texts shorter than one trigram — sequence infers a
    NEGATIVE step when start > stop ([1, 0], not []), unlike DuckDB's
    empty generate_series (r12 find; the two engines must agree on
    degenerate docs)."""
    return F.filter(
        F.get(F.transform(F.array(normalized_text(text)), lambda t:
              F.transform(F.sequence(F.lit(1),
                                     F.greatest(F.length(t) - 2,
                                                F.lit(0))),
                          lambda i: F.substring(t, i, 3))), 0),
        lambda g: F.length(g) == 3)


def trigram_profile(df: DataFrame, id_col: str, text_col: str,
                    k: int = 64) -> DataFrame:
    """(id, tri, rank): the top-``k`` trigrams of each row's text by
    count, ranked 1..k with the deterministic tie-break
    (count DESC, trigram ASC)."""
    tri = (df.select(F.col(id_col), F.explode(trigrams(F.col(text_col)))
                     .alias("tri"))
           .filter(F.col("tri") != "   ")
           .groupBy(id_col, "tri").agg(F.count("*").alias("cnt")))
    w = Window.partitionBy(id_col).orderBy(F.col("cnt").desc(),
                                           F.col("tri"))
    return (tri.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(id_col, "tri", "rank"))


def langid_ngram(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", k: int = 64,
                 out_col: str = "lang") -> DataFrame:
    """Cavnar-Trenkle LID over ``df``: returns (id_col, out_col, dist)
    — the winning language and its out-of-place distance. Ties break
    to the lexicographically smaller language code (deterministic)."""
    spark = df.sparkSession
    samples = spark.createDataFrame(
        sorted(LANG_SAMPLES.items()), "lang string, sample string")
    lang_prof = trigram_profile(samples, "lang", "sample", k) \
        .withColumnRenamed("rank", "lrank")
    doc_prof = trigram_profile(df, id_col, text_col, k) \
        .withColumnRenamed("rank", "drank")

    # fan each doc-profile row out to every candidate language via an
    # exploded LITERAL code array — a Generate node, not a join, so the
    # registry's no-BNLJ/no-cartesian plan guard holds by construction
    # (the language set is known at plan time; 8 codes per row)
    codes = F.array(*[F.lit(c) for c in sorted(LANG_SAMPLES)])
    scored = (doc_prof.withColumn("lang", F.explode(codes))
              .join(F.broadcast(lang_prof), ["lang", "tri"], "left")
              .groupBy(id_col, "lang")
              .agg(F.sum(F.coalesce(F.abs(F.col("drank")
                                          - F.col("lrank")),
                                    F.lit(k))).alias("dist")))
    w = Window.partitionBy(id_col).orderBy("dist", "lang")
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(id_col, F.col("lang").alias(out_col), "dist"))


def langid_oracle_sql(doc_cte: str, k: int = 64,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """The DuckDB replay of :func:`langid_ngram` over a CTE named
    ``docs`` (provided by ``doc_cte``): profiles are derived from the
    SAME sample literals through the same trigram/rank arithmetic."""
    values = ", ".join(
        f"('{lang}', '{text}')" for lang, text in
        sorted(LANG_SAMPLES.items()))

    def prof(src: str, idc: str, txt: str, rank_name: str) -> str:
        return (
            f"SELECT {idc}, tri, CAST(rn AS INT) AS {rank_name} FROM ("
            f"SELECT {idc}, tri, row_number() OVER (PARTITION BY {idc} "
            f"ORDER BY cnt DESC, tri) AS rn FROM ("
            f"SELECT {idc}, tri, count(*) AS cnt FROM ("
            f"SELECT {idc}, unnest(list_transform(generate_series(1, "
            f"greatest(strlen(pt) - 2, 0)), i -> substr(pt, i, 3))) "
            f"AS tri FROM (SELECT {idc}, ' ' || trim(regexp_replace("
            f"lower({txt}), '[^a-z]+', ' ', 'g')) || ' ' AS pt "
            f"FROM {src})) WHERE tri <> '   ' "
            f"GROUP BY {idc}, tri)) WHERE rn <= {k}"
        )

    return (
        # samp first: the caller's docs CTE may join it (fixtures
        # synthesize per-language text from the same samples)
        f"WITH samp(lang, sample) AS (VALUES {values}), "
        f"{doc_cte}, "
        f"lp AS ({prof('samp', 'lang', 'sample', 'lrank')}), "
        f"dp AS ({prof('docs', id_col, text_col, 'drank')}), "
        f"sc AS (SELECT dp.{id_col}, s.lang, "
        f"CAST(SUM(COALESCE(ABS(dp.drank - lp.lrank), {k})) AS BIGINT) "
        f"AS dist FROM dp CROSS JOIN (SELECT lang FROM samp) s "
        f"LEFT JOIN lp ON lp.lang = s.lang AND lp.tri = dp.tri "
        f"GROUP BY dp.{id_col}, s.lang) "
        f"SELECT {id_col}, lang, dist FROM (SELECT *, row_number() "
        f"OVER (PARTITION BY {id_col} ORDER BY dist, lang) AS rn "
        f"FROM sc) WHERE rn = 1"
    )

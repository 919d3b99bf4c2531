"""Model plug-in contract (docs/model_plugins.md): the *_factory slots of
the stubbed model operators accept real batch-predict builders. Fake
factories prove the plumbing end-to-end in this container; the skipif
tests run the identical code against real runtimes when importable."""

import importlib.util

import numpy as np
import pytest
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import annotators, multimodal


def _docs(spark):
    return spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta " * 600), (3, None)],
        "doc_id long, text string",
    )


def test_embed_documents_factory_path(spark):
    def const_encoder_factory():
        def encode_batch(chunk_texts):
            return np.full((len(chunk_texts), 4), 0.5, dtype=np.float32)

        return encode_batch

    out = annotators.embed_documents(
        _docs(spark), chunk_len=512, dim=4, encoder_factory=const_encoder_factory
    ).collect()
    by_id = {r.doc_id: r.embeddings for r in out}
    assert len(by_id[1]) == 1            # one chunk
    assert len(by_id[2]) == 2            # 600 words -> 2 chunks of <=512
    assert len(by_id[3]) == 1            # null text -> one empty-string chunk
    assert by_id[1][0] == pytest.approx([0.5] * 4)


def test_embed_documents_stub_matches_factory_shape(spark):
    # stub and factory paths must produce identical schema/chunking
    stub = annotators.embed_documents(_docs(spark), chunk_len=512, dim=4).collect()
    assert {r.doc_id: len(r.embeddings) for r in stub} == {1: 1, 2: 2, 3: 1}
    for r in stub:
        assert all(len(v) == 4 for v in r.embeddings)


def test_llm_annotate_factory_path(spark):
    def upper_len_complete_factory():
        def complete_batch(contents):
            return [f"{len(c) % 10} 1 2 0" for c in contents]

        return complete_batch

    out = annotators.llm_annotate(
        _docs(spark), complete_factory=upper_len_complete_factory
    )
    parsed = annotators.split_score_columns(out)
    rows = {r.doc_id: r for r in parsed.collect()}
    assert rows[1].output == f"{len('alpha beta gamma') % 10} 1 2 0"
    assert rows[1].practice == 1 and rows[1].difficulty == 0
    assert rows[3].output == "0 1 2 0"  # null text -> empty content


def test_fasttext_annotate_factory_path(spark):
    def parity_model_factory():
        def predict_batch(texts):
            return [len(t or "") % 2 for t in texts]

        return predict_batch

    out = {r.doc_id: r.label
           for r in annotators.fasttext_annotate(
               _docs(spark), model_factory=parity_model_factory).collect()}
    assert out == {1: len("alpha beta gamma") % 2, 2: (600 * 6) % 2, 3: 0}


def test_hf_classifier_factory_path(spark):
    def tens_pipeline_factory():
        def classify_batch(texts):
            return [min(len(t or "") // 10, 9) for t in texts]

        return classify_batch

    out = annotators.hf_classifier_annotate(
        _docs(spark), label_name="quality", pipeline_factory=tens_pipeline_factory
    )
    rows = {r.doc_id: r.cb_quality for r in out.collect()}
    assert rows[1] == 1 and rows[3] == 0


def test_image_features_codec_factory(spark):
    def white_codec_factory():
        def decode(blob):
            return np.full((4, 4, 3), 255, dtype=np.uint8)

        return decode

    media = spark.createDataFrame(
        [("m1", "image", bytearray(b"\x01\x02"), "image/png", 4, 4, None)],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.image_features(
        media, target=(2, 2), codec_factory=white_codec_factory
    ).collect()[0]
    assert (row.mean_r, row.mean_g, row.mean_b) == (255.0, 255.0, 255.0)


def test_executor_singleton_builds_once():
    calls = []

    def factory():
        calls.append(1)
        return "model"

    annotators._PLUGIN_SINGLETONS.pop(("tests.test_model_plugin", None), None)
    k = "test_singleton_key"
    annotators._PLUGIN_SINGLETONS.pop(k, None)
    assert annotators.executor_singleton(factory, k) == "model"
    assert annotators.executor_singleton(factory, k) == "model"
    assert len(calls) == 1


def test_stub_false_without_factory_raises(spark):
    with pytest.raises(NotImplementedError):
        annotators.embed_documents(_docs(spark), stub=False)
    with pytest.raises(NotImplementedError):
        annotators.llm_annotate(_docs(spark), stub=False)
    with pytest.raises(NotImplementedError):
        annotators.fasttext_annotate(_docs(spark), stub=False)
    with pytest.raises(NotImplementedError):
        annotators.hf_classifier_annotate(_docs(spark), stub=False)


# --- real-runtime integration (skip unless the library is installed) -------
# all carry @pytest.mark.real_models: `pytest -m real_models` runs exactly
# this group, and each test activates automatically once its library is
# importable (see README "Real-model smoke test")

needs_st = pytest.mark.skipif(
    importlib.util.find_spec("sentence_transformers") is None,
    reason="sentence-transformers not installed in this environment",
)
needs_fasttext = pytest.mark.skipif(
    importlib.util.find_spec("fasttext") is None,
    reason="fasttext not installed in this environment",
)
needs_pil = pytest.mark.skipif(
    importlib.util.find_spec("PIL") is None,
    reason="Pillow not installed in this environment",
)


@pytest.mark.real_models
@needs_st
def test_embed_documents_real_encoder(spark):
    def st_factory():
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer("all-MiniLM-L6-v2")

        def encode_batch(chunk_texts):
            return model.encode(list(chunk_texts), show_progress_bar=False)

        return encode_batch

    out = annotators.embed_documents(
        _docs(spark), chunk_len=128, dim=384, encoder_factory=st_factory
    ).collect()
    assert all(len(r.embeddings[0]) == 384 for r in out)


@pytest.mark.real_models
@needs_fasttext
def test_fasttext_real_model(tmp_path, spark):
    import fasttext

    train = tmp_path / "train.txt"
    train.write_text("__label__0 hello world\n__label__1 foo bar\n" * 50)
    model_path = tmp_path / "m.bin"
    fasttext.train_supervised(str(train), epoch=1).save_model(str(model_path))

    def ft_factory():
        m = fasttext.load_model(str(model_path))

        def predict_batch(texts):
            labels, _ = m.predict([(t or "").replace("\n", " ") for t in texts])
            return [int(l[0].removeprefix("__label__")) for l in labels]

        return predict_batch

    out = annotators.fasttext_annotate(_docs(spark), model_factory=ft_factory)
    assert out.count() == 3


@pytest.mark.real_models
@needs_pil
def test_image_features_real_pil(spark):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (8, 8), (10, 20, 30)).save(buf, format="PNG")

    def pil_factory():
        def decode(blob):
            return np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))

        return decode

    media = spark.createDataFrame(
        [("m1", "image", bytearray(buf.getvalue()), "image/png", 8, 8, None)],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.image_features(
        media, target=(2, 2), codec_factory=pil_factory
    ).collect()[0]
    assert (row.mean_r, row.mean_g, row.mean_b) == (10.0, 20.0, 30.0)

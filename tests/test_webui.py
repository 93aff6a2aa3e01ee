"""WebUI tests: zh/en i18n chain, config round-trip editing, HTTP surface.

Reference parity: app.py's Gradio UI with I18nAuto (app.py:423-440) and the
ruamel train.yaml round-trip (app.py:169-180).
"""

import os
import threading
import urllib.request

import numpy as np

from whisper_vits_svc_tpu.cli.webui import (
    I18n, STRINGS, create_train_config, _Handler,
)
from whisper_vits_svc_tpu.utils.config import edit_config_file, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_i18n_languages_complete_and_fallback():
    zh, en = I18n("zh_CN"), I18n("en_US")
    for key, texts in STRINGS.items():
        assert "zh_CN" in texts, f"{key} missing zh_CN"
        assert zh(key) == texts["zh_CN"]
        # en resolves en text when present, else falls back through SUPER chain
        assert en(key) == texts.get("en_US", texts["zh_CN"])
    # unknown locale falls back to zh_CN (reference app.py:429-431)
    assert I18n("fr_FR").language == "zh_CN"
    assert I18n("de").language == "zh_CN"
    # unknown key passes through (never crash the page render)
    assert zh("definitely_not_a_key") == "definitely_not_a_key"


def test_config_roundtrip_edit_preserves_comments(tmp_path):
    src = os.path.join(REPO, "configs", "base.yaml")
    dst = str(tmp_path / "train.yaml")
    text = edit_config_file(src, dst, {
        "train": {"learning_rate": 1.5e-4, "batch_size": 4, "model": "mymodel",
                  "pretrain": "vits_pretrain/sovits5.0.pretrain.pth"},
        "log": {"info_interval": 50, "keep_ckpts": 3},
    })
    # values rewritten
    cfg = load_config(dst)
    assert cfg.train.learning_rate == 1.5e-4
    assert cfg.train.batch_size == 4
    assert cfg.train.model == "mymodel"
    assert cfg.train.pretrain == "vits_pretrain/sovits5.0.pretrain.pth"
    assert cfg.log.info_interval == 50
    assert cfg.log.keep_ckpts == 3
    # untouched values and ALL comments survive verbatim
    orig = open(src).read()
    assert cfg.data.hop_length == 320
    assert cfg.mpd.periods == [2, 3, 5, 7, 11]
    orig_comments = [l for l in orig.split("\n") if l.lstrip().startswith("#")]
    new_comments = [l for l in text.split("\n") if l.lstrip().startswith("#")]
    assert orig_comments == new_comments
    # inline comments on edited lines survive too
    for line in text.split("\n"):
        if line.strip().startswith("info_interval"):
            break
    # unknown keys raise instead of silently dropping
    import pytest

    with pytest.raises(KeyError):
        edit_config_file(src, dst, {"train": {"nonexistent_key": 1}})


def test_create_train_config_from_form(tmp_path):
    src = os.path.join(REPO, "configs", "base.yaml")
    dst = str(tmp_path / "train.yaml")
    form = dict(model_name="run1", learning_rate="2e-4", batch_size="16",
                info_interval="10", eval_interval="2", save_interval="1",
                keep_ckpts="2", use_pretrain="1",
                pretrain_path="vits_pretrain/x.pth")
    create_train_config(src, dst, form)
    cfg = load_config(dst)
    assert cfg.train.model == "run1"
    assert cfg.train.learning_rate == 2e-4
    assert cfg.train.batch_size == 16
    assert cfg.log.eval_interval == 2
    assert cfg.train.pretrain == "vits_pretrain/x.pth"

    # without the pretrain checkbox the path must be cleared (app.py:178-180)
    form2 = dict(form)
    form2.pop("use_pretrain")
    create_train_config(src, dst, form2)
    assert load_config(dst).train.pretrain == ""


def test_webui_http_surface():
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/?lang=en_US", timeout=10
        ).read().decode()
        assert "Preprocessing-Training" in page      # en i18n applied
        assert "svc_out.wav" in page
        zh_page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/?lang=zh_CN", timeout=10
        ).read().decode()
        assert "预处理-训练" in zh_page               # zh i18n applied
        log = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/log", timeout=10
        ).read().decode()
        assert log  # "(no jobs yet)" in the default language
    finally:
        server.shutdown()

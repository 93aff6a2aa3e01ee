"""WebUI — browser front-end for preprocessing/training/inference.

Capability mirror of the reference Gradio app (app.py:13-146: one-key
preprocess+train tab, model export, inference tab with pitch shift) built on
the standard library's http.server — the environment ships no gradio, and a
zero-dependency UI keeps the serving container minimal. Long-running jobs run
in daemon threads with a live log buffer the page polls.
"""

from __future__ import annotations

import html
import io
import json
import os
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_JOBS: dict[str, dict] = {}


def _run_job(name: str, fn, *args, **kw):
    buf = io.StringIO()
    _JOBS[name] = {"status": "running", "log": buf}

    def target():
        import contextlib

        try:
            with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
                fn(*args, **kw)
            _JOBS[name]["status"] = "done"
        except Exception as e:  # surface the failure in the UI
            buf.write(f"\nERROR: {e!r}\n")
            _JOBS[name]["status"] = "failed"

    threading.Thread(target=target, daemon=True).start()


_PAGE = """<!doctype html><html><head><title>whisper-vits-svc TPU</title>
<style>body{{font-family:sans-serif;max-width:900px;margin:2em auto}}
fieldset{{margin-bottom:1.5em}} pre{{background:#f4f4f4;padding:1em;max-height:300px;overflow:auto}}
input[type=text]{{width:24em}}</style></head><body>
<h1>whisper-vits-svc TPU</h1>
<fieldset><legend>Preprocess + Train</legend>
<form method="post" action="/train">
  dataset_raw: <input type="text" name="dataset" value="dataset_raw"><br><br>
  config: <input type="text" name="config" value="configs/base.yaml"><br><br>
  run name: <input type="text" name="name" value="sovits5.0"><br><br>
  max steps (blank = full): <input type="text" name="max_steps" value=""><br><br>
  <button name="action" value="preprocess">Preprocess</button>
  <button name="action" value="train">Train</button>
  <button name="action" value="onekey">One-key (both)</button>
</form></fieldset>
<fieldset><legend>Export</legend>
<form method="post" action="/export">
  checkpoint: <input type="text" name="checkpoint" value="chkpt/sovits5.0/sovits5.0_0005.ckpt">
  <button>Export inference model</button>
</form></fieldset>
<fieldset><legend>Inference</legend>
<form method="post" action="/infer">
  config: <input type="text" name="config" value="configs/base.yaml"><br><br>
  model: <input type="text" name="model" value="sovits5.0_export.ckpt"><br><br>
  input wav: <input type="text" name="wave" value="test.wav"><br><br>
  speaker npy: <input type="text" name="spk" value="data_svc/singer/speaker0.spk.npy"><br><br>
  pitch shift (semitones): <input type="text" name="shift" value="0"><br><br>
  <button>Convert</button> (output: svc_out.wav)
</form></fieldset>
<fieldset><legend>Jobs</legend><pre id="log">{log}</pre></fieldset>
<script>setInterval(async()=>{{const r=await fetch('/log');document.getElementById('log').textContent=await r.text();}},2000)</script>
</body></html>"""


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _send(self, body: str, code=200, ctype="text/html"):
        data = body.encode()
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _log_text(self) -> str:
        parts = []
        for name, job in _JOBS.items():
            parts.append(f"== {name} [{job['status']}] ==")
            parts.append(job["log"].getvalue()[-4000:])
        return "\n".join(parts) or "(no jobs yet)"

    def do_GET(self):
        if self.path == "/log":
            self._send(self._log_text(), ctype="text/plain")
        else:
            self._send(_PAGE.format(log=html.escape(self._log_text())))

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        form = urllib.parse.parse_qs(self.rfile.read(length).decode())
        get = lambda k, d="": form.get(k, [d])[0]  # noqa: E731

        if self.path == "/train":
            action = get("action")
            if action in ("preprocess", "onekey"):
                from .preprocessing import main as pre_main

                _run_job("preprocess", pre_main,
                         ["--dataset-raw", get("dataset"), "-c", get("config")])
            if action in ("train", "onekey"):
                from .trainer import main as train_main

                argv = ["-c", get("config"), "-n", get("name")]
                if get("max_steps"):
                    argv += ["--max-steps", get("max_steps")]
                _run_job("train", train_main, argv)
        elif self.path == "/export":
            from .export import main as export_main

            _run_job("export", export_main, ["--checkpoint", get("checkpoint")])
        elif self.path == "/infer":
            from .inference import main as infer_main

            _run_job("infer", infer_main, [
                "--config", get("config"), "--model", get("model"),
                "--wave", get("wave"), "--spk", get("spk"),
                "--shift", get("shift", "0"),
            ])
        self.send_response(303)
        self.send_header("Location", "/")
        self.end_headers()


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(prog="app")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args(argv)
    server = ThreadingHTTPServer((args.host, args.port), _Handler)
    print(f"WebUI at http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()

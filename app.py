#!/usr/bin/env python
"""WebUI entry point (reference app.py equivalent, stdlib HTTP instead of gradio)."""
from whisper_vits_svc_tpu.cli.webui import main

if __name__ == "__main__":
    main()

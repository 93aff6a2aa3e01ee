#!/usr/bin/env python
"""Entry point mirroring the reference CLI surface (reference svc_inference.py)."""
from whisper_vits_svc_tpu.cli.inference import main

if __name__ == "__main__":
    main()

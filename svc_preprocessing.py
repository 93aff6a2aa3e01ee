#!/usr/bin/env python
"""Entry point mirroring the reference CLI surface (reference svc_preprocessing.py)."""
from whisper_vits_svc_tpu.cli.preprocessing import main

if __name__ == "__main__":
    main()

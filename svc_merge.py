#!/usr/bin/env python
"""Entry point mirroring the reference svc_merge.py."""
from whisper_vits_svc_tpu.cli.misc import merge_main

if __name__ == "__main__":
    merge_main()

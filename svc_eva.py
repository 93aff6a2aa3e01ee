#!/usr/bin/env python
"""Entry point mirroring the reference svc_eva.py."""
from whisper_vits_svc_tpu.cli.misc import eva_main

if __name__ == "__main__":
    eva_main()

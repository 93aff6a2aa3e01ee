#!/usr/bin/env python
"""Entry point mirroring the reference svc_train_retrieval.py."""
from whisper_vits_svc_tpu.cli.misc import train_retrieval_main

if __name__ == "__main__":
    train_retrieval_main()

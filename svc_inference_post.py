#!/usr/bin/env python
"""Entry point mirroring the reference svc_inference_post.py."""
from whisper_vits_svc_tpu.cli.misc import inference_post_main

if __name__ == "__main__":
    inference_post_main()

#!/usr/bin/env python
"""Reference-CLI-compatible entrypoint (same name as the reference repo's
train.py); delegates to cvpr2021_vspw_implement_tpu.train."""
from cvpr2021_vspw_implement_tpu.train import main

if __name__ == "__main__":
    main()

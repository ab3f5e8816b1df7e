#!/usr/bin/env python
"""Reference-CLI-compatible entrypoint (same name as the reference repo's
change2_480p.py); delegates to cvpr2021_vspw_implement_tpu.data.preprocess."""
from cvpr2021_vspw_implement_tpu.data.preprocess import main

if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Reference-CLI-compatible entrypoint (same name as the reference repo's
TC_cal.py); delegates to cvpr2021_vspw_implement_tpu.tc_cal."""
from cvpr2021_vspw_implement_tpu.tc_cal import main

if __name__ == "__main__":
    main()

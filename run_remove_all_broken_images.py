#!/usr/bin/env python3
"""Full-corpus broken-image scan -> ignore lists
(reference run_remove-all-broken-images.py)."""
from rapidobjectdetectionusingcascadedcnns_tpu.data.file_list import FileListLoader
from rapidobjectdetectionusingcascadedcnns_tpu.utils import log

if __name__ == "__main__":
    broken = FileListLoader().remove_broken_images()
    log.log("{} broken images moved to ignore lists".format(len(broken)))

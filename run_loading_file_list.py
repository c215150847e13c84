#!/usr/bin/env python3
"""Warm the file-list discovery (reference run_loading_file_list.py)."""
from rapidobjectdetectionusingcascadedcnns_tpu.data.file_list import FileListLoader
from rapidobjectdetectionusingcascadedcnns_tpu.utils import log

if __name__ == "__main__":
    infos = FileListLoader().image_infos
    log.log("discovered {} files".format(len(infos)))

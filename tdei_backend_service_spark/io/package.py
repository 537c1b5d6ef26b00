"""Job packaging + response messages — the reference's zip/publish tail.

Reference: after per-file uploads, the service zips every produced file,
uploads the zip, and publishes a success/failure message with the
file path (/root/reference/src/service/base/osw-backend-abstract.ts:24-104,
zip at :37-63; response format /root/reference/README.md:81-95; empty
result -> "No data found..." :88-90). The 5 s + 15 s blob-availability
sleeps (:86,92) are queue-era artifacts with no Spark analogue and are
deliberately dropped.

Here the "upload" is a directory; the queue message becomes a JSON job
manifest next to the zip.
"""

from __future__ import annotations

import json
import os
import zipfile

from .geojson import NO_DATA_MESSAGE


def zip_outputs(out_dir: str, zip_name: str = "export.zip",
                exclude: tuple = (".zip", ".json")) -> str | None:
    """Zip every produced file in ``out_dir`` (the reference zips all
    uploaded files, osw-backend-abstract.ts:37-63). Returns None when
    there is nothing to package."""
    files = [f for f in sorted(os.listdir(out_dir))
             if os.path.isfile(os.path.join(out_dir, f))
             and not f.startswith("_") and not f.endswith(exclude)]
    if not files:
        return None
    zpath = os.path.join(out_dir, zip_name)
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for f in files:
            z.write(os.path.join(out_dir, f), arcname=f)
    return zpath


def response_message(message_id: str, service: str, out_dir: str,
                     success: bool, error: str | None = None) -> dict:
    """The job response (reference format: README.md:81-95 — messageId,
    messageType, data.status/message/success/file_upload_path)."""
    zpath = zip_outputs(out_dir) if success and os.path.isdir(out_dir) else None
    if success and zpath is None and error is None:
        success, error = False, NO_DATA_MESSAGE
    msg = {
        "messageId": message_id,
        "messageType": service,
        "data": {
            "success": success,
            "message": error or "",
            "file_upload_path": zpath or "",
        },
    }
    if os.path.isdir(out_dir):
        with open(os.path.join(out_dir, "job_response.json"), "w") as f:
            json.dump(msg, f, indent=1)
    return msg

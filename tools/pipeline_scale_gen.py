#!/usr/bin/env python3
"""Scaled raw-JSON fixture generator for the five pipeline mains — the
pipeline-layer analogue of tools/scale_gen.py. The specs exercise the
mains on hand-sized fixtures (2-9 rows); this writes the SAME payload
shapes (field-for-field the PipelineSpec fixtures, which themselves
mirror the reference's raw API dumps) at a volume where per-row work
dominates session overhead, laid out exactly as each main's glob
expects:

  RAW/jhub/year=Y/month=M/day=D/hour=H/logs.json      (JhubMain all)
  RAW/zoom/air-meetings-logs-DATE/meetings_logs_DATE.json
  RAW/zoom/air-meetings-data/dN/participants_N.json   (Zoom[Hst]Main)
  RAW/vk/data2024-01-01/{gsom_ma,members_full_group_gsom_ma,
                         wall_owner_id_*}.json        (VkMain)
  RAW/monkey/{details/survey_*,responses/responses_*}.json (MonkeyMain)

Row volumes at scale=1: ~480k jhub log lines, 50k zoom meetings
(100k recording rows, 150k participants), 100k vk members + 20k wall
items, 2k surveys + 100k responses. `scale` multiplies the per-unit
counts. Deterministic (no randomness — ids are sequential), so two
generations are byte-identical.

Usage: python3 tools/pipeline_scale_gen.py RAW_ROOT [scale]
"""
import os
import sys

root = sys.argv[1]
scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0


def n(base):
    return max(1, int(base * scale))


def w(relpath, lines):
    p = os.path.join(root, relpath)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write("\n".join(lines))


# --- jhub: fluent-bit kubernetes log lines (PipelineSpec.jhubFixture) --
HOURS = 24
PER_HOUR = n(20000)
for h in range(HOURS):
    lines = []
    for i in range(PER_HOUR):
        code = 200 + (i % 3) * 100
        ts = f"2024-01-01T{h:02d}:{(i // 600) % 60:02d}:{i % 60:02d}.{i % 1000:03d}456789Z"
        logts = f"2024-01-01 {h:02d}:{(i // 600) % 60:02d}:{i % 60:02d}.{i % 1000:03d}"
        if i % 7 == 6:  # the no-brackets fallback line every spec pins
            log = f"plain line {i} with no brackets"
        else:
            log = (f"[I {logts} JupyterHub app:{code}] "
                   f"GET /hub/api/users/u{i}")
        lines.append(
            '{"log": "%s", "time": "%s", "kubernetes": '
            '{"container_name": "hub", "host": "node%d", '
            '"pod_name": "hub-%d", "annotations": {"noisy": "%d"}, '
            '"labels": {"app": "jhub"}}}' % (log, ts, i % 5, i % 3, i))
    w(f"jhub/year=2024/month=01/day=01/hour={h:02d}/logs.json", lines)
print(f"jhub: {HOURS * PER_HOUR} log lines")

# --- zoom: dated meeting dumps + participants (zoomMeetingsFixture) ----
DAYS = 20
MEETINGS_PER_DAY = n(2500)
RECS_PER_MEETING = 2
PARTS_PER_MEETING = 3


def meeting(mid, uuid, day):
    recs = ",".join(
        '{"download_url": "https://dl/%s/%d", "file_extension": "MP4", '
        '"file_size": %d, "file_type": "MP4", "id": "rec-%s-%d", '
        '"meeting_id": "%s", "play_url": "https://play/%s/%d", '
        '"recording_end": "2024-01-%02dT11:00:%02dZ", '
        '"recording_start": "2024-01-%02dT10:00:%02dZ", '
        '"recording_type": "shared_screen", "status": "completed"}'
        % (uuid, i, 1000 + i, uuid, i, uuid, uuid, i, day, i % 60, day,
           i % 60) for i in range(RECS_PER_MEETING))
    return ('{"account_id": "acc1", "duration": %d, "host_email": "h@x.io", '
            '"host_id": "host%d", "id": %d, "recording_count": %d, '
            '"share_url": "https://share/%d", '
            '"start_time": "2024-01-%02dT09:00:00Z", "timezone": "UTC", '
            '"topic": "Topic %d", "total_size": %d, "type": 2, '
            '"uuid": "%s", "recording_files": [%s]}'
            % (30 + mid % 120, mid, mid, RECS_PER_MEETING, mid, day, mid,
               5000 * (mid % 97 + 1), uuid, recs))


def participant(pid):
    return ('{"camera": "cam%d", "connection_type": "UDP", '
            '"customer_key": "ck", "data_center": "EU", "device": "Mac", '
            '"domain": "d", "email": "p%d@x.io", "from_sip_uri": "", '
            '"full_data_center": "EU-FR", "harddisk_id": "hd", '
            '"id": "pid%d", "internal_ip_addresses": ["10.0.0.%d", '
            '"10.0.1.%d"], "ip_address": "1.2.3.%d", '
            '"join_time": "2024-01-01T09:05:%02dZ", '
            '"leave_reason": "left", '
            '"leave_time": "2024-01-01T09:55:%02dZ", "location": "Paris", '
            '"mac_addr": "aa:bb", "microphone": "mic", '
            '"network_type": "Wifi", "participant_user_id": "pu%d", '
            '"pc_name": "pc", "recording": %s, "registrant_id": "r%d", '
            '"role": "host", "share_application": false, '
            '"share_desktop": true, "share_whiteboard": false, '
            '"sip_uri": "", "speaker": "spk", "status": "in_meeting", '
            '"user_id": "u%d", "user_name": "User %d", "version": "5.0"}'
            % (pid, pid, pid, pid % 250, pid % 250, pid % 250, pid % 60,
               pid % 60, pid, "true" if pid % 2 == 0 else "false", pid,
               pid, pid))


# Page size for the single-JSON-document dump shapes below. The APIs
# these fixtures mirror are paginated (the loader layer's whole S6-S12
# family exists to walk those pages), so a scaled dump is MANY page
# files per date, not one ever-growing document — the mains' globs
# (meetings_logs_{date}*.json, wall_owner_id_*.json) already match page
# suffixes. This also matters mechanically: a single-line JSON document
# is one unsplittable parse task in Spark, and at scale 100 the
# one-file-per-date shape produced 241 MB single-record documents whose
# 20 concurrent parses OOMed a 32 GB driver. Each page repeats the full
# total_records/count (what the real APIs do), so flattened columns are
# identical to the unpaginated shape; page 0 keeps the unpaginated
# file name, so scale <= 1 output is byte-identical to before.
ZOOM_PAGE = 2500

mid = 0
for day in range(1, DAYS + 1):
    date = f"2024-01-{day:02d}"
    ms = [meeting(mid + i, f"uuid-{mid + i}", day)
          for i in range(MEETINGS_PER_DAY)]
    for p in range(0, len(ms), ZOOM_PAGE):
        suffix = "" if p == 0 else f"_page{p // ZOOM_PAGE}"
        w(f"zoom/air-meetings-logs-{date}/meetings_logs_{date}{suffix}.json",
          ['{"from": "%s", "to": "%s", "total_records": %d, "meetings": [%s]}'
           % (date, date, len(ms), ",".join(ms[p:p + ZOOM_PAGE]))])
    plines = []
    for i in range(MEETINGS_PER_DAY):
        parts = ",".join(participant((mid + i) * PARTS_PER_MEETING + j)
                         for j in range(PARTS_PER_MEETING))
        plines.append('{"uuid": "uuid-%d", "participants_data": '
                      '{"participants": [%s]}}' % (mid + i, parts))
    w(f"zoom/air-meetings-data/d{day}/participants_{day}.json", plines)
    mid += MEETINGS_PER_DAY
print(f"zoom: {mid} meetings, {mid * RECS_PER_MEETING} records, "
      f"{mid * PARTS_PER_MEETING} participants")

# --- vk: one group (the collected-scalar FK), members, wall dumps ------
w("vk/data2024-01-01/gsom_ma.json", [
    '{"id": 100, "type": "page", "name": "GSOM", "screen_name": "gsom_ma",'
    ' "activity": "education", "description": "desc", "is_closed": 0,'
    ' "members_count": 2, "status": "st", "verified": 1,'
    ' "site": "gsom.spbu.ru", "wiki_page": "w",'
    ' "city": {"id": 2, "title": "SPB"},'
    ' "country": {"id": 1, "title": "RU"},'
    ' "contacts": [{"desc": "dean", "email": "dean@x.io", "phone": "+7"}],'
    ' "links": [{"id": 5, "name": "site", "desc": "main",'
    ' "url": "https://x"}]}'])

N_MEMBERS = n(100000)


def member(i):
    return ('{"id": %d, "first_name": "F%d", "last_name": "L%d", '
            '"maiden_name": "", "screen_name": "sn%d", "nickname": "", '
            '"sex": %d, "city": {"id": 2, "title": "SPB"}, '
            '"home_town": "SPB", "country": {"id": 1, "title": "RU"}, '
            '"about": "", "activities": "", "books": "", "can_post": 1, '
            '"deactivated": "", "domain": "d%d", "followers_count": %d, '
            '"friend_status": 0, "games": "", "interests": "", '
            '"is_closed": false, "is_friend": 0, "personal": "", '
            '"site": "", "skype": "", "livejournal": "", "twitter": "", '
            '"has_mobile": 1, "mobile_phone": "", "home_phone": "", '
            '"status": "", "relation": 0, "relation_partner_id": 0, '
            '"relation_partner_first_name": "", '
            '"relation_partner_last_name": "", "education_form": 1, '
            '"education_status": "Student", "faculty": 11, '
            '"faculty_name": "Mgmt", "graduation": %d, "university": 22, '
            '"university_name": "SPbU", "occupation": {"id": 33, '
            '"name": "SPbU", "type": "university"}, "movies": "", '
            '"music": "", "trending": 0, "tv": "", "verified": 0, '
            '"wall_default": 0, "last_seen": {"platform": 4, '
            '"time": %d}, "career": [{"city_id": 2, "country_id": 1, '
            '"company": "Acme", "group_id": 9, "position": "dev", '
            '"from": 2020, "until": 2022}], "schools": [{"city": 2, '
            '"class": "a", "country": 1, "id": "sch%d", '
            '"name": "School %d", "speciality": "math", "type": 1, '
            '"type_str": "gymnasium", "year_from": 2010, '
            '"year_graduated": 2017, "year_to": 2017}], '
            '"universities": [{"chair": 7, "chair_name": "IS", "city": 2, '
            '"country": 1, "education_form": 1, '
            '"education_status": "Student", "faculty": 11, '
            '"faculty_name": "Mgmt", "graduation": 2024, "id": 22, '
            '"name": "SPbU"}]}'
            % (i, i, i, i, (i % 2) + 1, i, 10 * i, 2020 + i % 8,
               1700000000 + i, i % 40, i % 40))


w("vk/data2024-01-01/members_full_group_gsom_ma.json",
  [member(i) for i in range(1, N_MEMBERS + 1)])

WALL_FILES = 10
ITEMS_PER_FILE = n(2000)
for f in range(WALL_FILES):
    items = []
    for i in range(ITEMS_PER_FILE):
        iid = f * ITEMS_PER_FILE + i
        items.append(
            '{"owner_id": -100, "from_id": -100, "id": %d, "date": %d, '
            '"edited": %d, "post_type": "post", "text": "wall post %d", '
            '"comments": {"count": %d}, "donut": {"is_donut": false}, '
            '"likes": {"count": %d, "user_likes": 0}, '
            '"post_source": {"type": "vk"}, "reposts": {"count": %d, '
            '"user_reposted": 0}, "views": {"count": %d}, '
            '"copy_history": [{"id": %d, "from_id": -200, '
            '"owner_id": -200, "date": %d, "post_type": "post", '
            '"text": "original %d", "post_source": '
            '{"platform": "android", "type": "api"}}]}'
            % (iid, 1700000100 + iid, 1700000200 + iid, iid, iid % 50,
               iid % 500, iid % 20, iid % 5000, iid + 1000000,
               1690000000 + iid, iid))
    # offset-paginated like the wall API itself (see ZOOM_PAGE note)
    for off in range(0, len(items), 2000):
        suffix = "" if off == 0 else f"_offset{off}"
        w(f"vk/data2024-01-01/wall_owner_id_{f}{suffix}.json",
          ['{"count": %d, "items": [%s]}'
           % (len(items), ",".join(items[off:off + 2000]))])
print(f"vk: {N_MEMBERS} members, {WALL_FILES * ITEMS_PER_FILE} wall items")

# --- monkey: survey details + response dumps ---------------------------
N_SURVEYS = n(2000)
slines = []
for s in range(1, N_SURVEYS + 1):
    qs = []
    for q in range(2):
        qid = s * 10 + q
        choices = ",".join(
            '{"id": %d, "is_na": false, "position": %d, "quiz_options": '
            '{"score": "%d"}, "text": "Choice %d", "visible": true, '
            '"weight": %d}' % (qid * 10 + c, c + 1, 5 - 4 * c,
                               qid * 10 + c, 10 - 9 * c)
            for c in range(2))
        qs.append('{"id": %d, "position": %d, "headings": [{"heading": '
                  '"Question %d?"}], "answers": {"choices": [%s]}}'
                  % (qid, q + 1, qid, choices))
    slines.append(
        '{"id": %d, "title": "Survey %d", "language": "en", '
        '"folder_id": %d, "date_created": "2021-12-%02dT10:40:00", '
        '"date_modified": "2021-12-%02dT11:00:00", "page_count": 1, '
        '"question_count": 2, "response_count": %d, "pages": [{"id": %d, '
        '"position": 1, "question_count": 2, "title": "P1", '
        '"questions": [%s]}]}'
        % (s, s, s % 7, (s % 28) + 1, (s % 28) + 1, 50, s * 100,
           ",".join(qs)))
w("monkey/details/survey_details.json", slines)

RESP_FILES = 50
RESP_PER_FILE = n(2000)
rid = 0
for f in range(RESP_FILES):
    rlines = []
    for i in range(RESP_PER_FILE):
        rid += 1
        sid = (rid % N_SURVEYS) + 1
        qid = sid * 10 + rid % 2
        rlines.append(
            '{"data": [{"id": %d, "survey_id": %d, "date_created": '
            '"2022-01-%02dT09:00:00", "date_modified": '
            '"2022-01-%02dT09:10:00", "email_address": "r%d@x.io", '
            '"ip_address": "9.9.%d.%d", "first_name": "FN%d", '
            '"last_name": "LN%d", "recipient_id": %d, '
            '"response_status": "completed", "total_time": %d, '
            '"pages": [{"id": %d, "questions": [{"id": %d, "answers": '
            '[{"choice_id": %d, "row_id": 0, "text": "Choice %d", '
            '"quiz_options": {"weight": %d}}]}]}]}]}'
            % (rid, sid, (rid % 28) + 1, (rid % 28) + 1, rid,
               rid % 250, rid % 250, rid, rid, rid + 50, rid % 600,
               sid * 100, qid, qid * 10 + rid % 2, qid * 10 + rid % 2,
               10 - 9 * (rid % 2)))
    w(f"monkey/responses/responses_{f}.json", rlines)
print(f"monkey: {N_SURVEYS} surveys, {rid} responses")

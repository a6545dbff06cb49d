// Native host ingest for deepfake_tpu.
//
// C++ replacements for the reference's Python-worker decode path:
//  * df_decode_clip      — evenly-spaced frame seek-decode -> uint8 RGB clip
//                          (counterpart of reference src/utils.py:22-39, but
//                          GIL-free and per-thread);
//  * df_decode_sequential— all-frames decode for the long-video chunker;
//  * df_decode_audio     — libavformat/avcodec demux+decode + swresample to
//                          mono float PCM (counterpart of the reference's
//                          pydub->FFmpeg-subprocess->tempfile round trip,
//                          src/utils.py:41-49, without temp files or races);
//  * df_ingest_*         — a worker-pool + bounded ring buffer of fixed-shape
//                          slots feeding batches to the device loop
//                          (counterpart of data/cuda_dataloader.py's
//                          thread+queue prefetcher, host side).
//
// Build: python -m deepfake_tpu.native.build   (g++ -O3 -fPIC -shared)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

// ---------------------------------------------------------------- video

extern "C" int df_decode_clip(const char* path, int num_frames, int size,
                              uint8_t* out) {
  // out: [num_frames, size, size, 3] RGB. Short clips repeat the last frame
  // (static shapes). Returns frames decoded, or -1 on open failure.
  cv::VideoCapture cap(path);
  if (!cap.isOpened()) return -1;
  const long total = (long)cap.get(cv::CAP_PROP_FRAME_COUNT);
  const long interval = std::max(total / std::max(num_frames, 1), 1L);
  const size_t frame_bytes = (size_t)size * size * 3;
  cv::Mat frame, rgb, resized;
  int got = 0;
  for (int i = 0; i < num_frames; ++i) {
    cap.set(cv::CAP_PROP_POS_FRAMES, (double)(i * interval));
    if (!cap.read(frame) || frame.empty()) break;
    cv::cvtColor(frame, rgb, cv::COLOR_BGR2RGB);
    cv::resize(rgb, resized, cv::Size(size, size), 0, 0, cv::INTER_LINEAR);
    std::memcpy(out + (size_t)i * frame_bytes, resized.data, frame_bytes);
    ++got;
  }
  cap.release();
  if (got == 0) {
    std::memset(out, 0, frame_bytes * num_frames);
    return 0;
  }
  for (int i = got; i < num_frames; ++i)
    std::memcpy(out + (size_t)i * frame_bytes,
                out + (size_t)(got - 1) * frame_bytes, frame_bytes);
  return got;
}

extern "C" int df_decode_clip_seq(const char* path, int num_frames, int size,
                                  uint8_t* out) {
  // Sequential-scan sampling: stream-decode once, keeping the evenly-spaced
  // frames. Avoids the reference's 32 random seeks per clip
  // (src/utils.py:28-31) — on short clips the demuxer restart cost of
  // seeking dominates, so streaming wins despite decoding every frame.
  cv::VideoCapture cap(path);
  if (!cap.isOpened()) return -1;
  const long total = (long)cap.get(cv::CAP_PROP_FRAME_COUNT);
  const long interval = std::max(total / std::max(num_frames, 1), 1L);
  const size_t frame_bytes = (size_t)size * size * 3;
  cv::Mat frame, rgb, resized;
  int got = 0;
  long pos = 0;
  long next_keep = 0;
  while (got < num_frames && cap.read(frame) && !frame.empty()) {
    if (pos == next_keep) {
      cv::cvtColor(frame, rgb, cv::COLOR_BGR2RGB);
      cv::resize(rgb, resized, cv::Size(size, size), 0, 0, cv::INTER_LINEAR);
      std::memcpy(out + (size_t)got * frame_bytes, resized.data, frame_bytes);
      ++got;
      next_keep = (long)got * interval;
    }
    ++pos;
  }
  cap.release();
  if (got == 0) {
    std::memset(out, 0, frame_bytes * num_frames);
    return 0;
  }
  for (int i = got; i < num_frames; ++i)
    std::memcpy(out + (size_t)i * frame_bytes,
                out + (size_t)(got - 1) * frame_bytes, frame_bytes);
  return got;
}

extern "C" long df_decode_sequential(const char* path, int size,
                                     long max_frames, uint8_t* out) {
  // out: [max_frames, size, size, 3]; returns frames written or -1.
  cv::VideoCapture cap(path);
  if (!cap.isOpened()) return -1;
  const size_t frame_bytes = (size_t)size * size * 3;
  cv::Mat frame, rgb, resized;
  long n = 0;
  while (n < max_frames && cap.read(frame) && !frame.empty()) {
    cv::cvtColor(frame, rgb, cv::COLOR_BGR2RGB);
    cv::resize(rgb, resized, cv::Size(size, size), 0, 0, cv::INTER_LINEAR);
    std::memcpy(out + (size_t)n * frame_bytes, resized.data, frame_bytes);
    ++n;
  }
  cap.release();
  return n;
}

// ---------------------------------------------------------------- audio

extern "C" long df_decode_audio(const char* path, int sample_rate, float* out,
                                long max_samples) {
  // Demux + decode the first audio stream, resample to mono float
  // `sample_rate`; returns samples written, 0 if no audio stream, -1 on error.
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  long written = -1;
  AVCodecContext* dec = nullptr;
  SwrContext* swr = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  do {
    if (avformat_find_stream_info(fmt, nullptr) < 0) break;
    const AVCodec* codec = nullptr;
    int stream = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
    if (stream < 0 || !codec) { written = 0; break; }
    dec = avcodec_alloc_context3(codec);
    if (!dec) break;
    if (avcodec_parameters_to_context(dec, fmt->streams[stream]->codecpar) < 0)
      break;
    if (avcodec_open2(dec, codec, nullptr) < 0) break;

    AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
    AVChannelLayout in_layout;
    if (dec->ch_layout.nb_channels > 0)
      av_channel_layout_copy(&in_layout, &dec->ch_layout);
    else
      av_channel_layout_default(&in_layout, 2);
    if (swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, sample_rate,
                            &in_layout, dec->sample_fmt, dec->sample_rate,
                            0, nullptr) < 0)
      break;
    if (swr_init(swr) < 0) break;

    pkt = av_packet_alloc();
    frame = av_frame_alloc();
    written = 0;
    std::vector<float> chunk;
    auto drain = [&](AVFrame* f) {
      const int out_cap =
          (int)av_rescale_rnd(swr_get_delay(swr, dec->sample_rate) +
                                  (f ? f->nb_samples : 0),
                              sample_rate, dec->sample_rate, AV_ROUND_UP) + 64;
      chunk.resize((size_t)std::max(out_cap, 64));
      uint8_t* outp = (uint8_t*)chunk.data();
      const uint8_t** inp = f ? (const uint8_t**)f->extended_data : nullptr;
      int got = swr_convert(swr, &outp, (int)chunk.size(), inp,
                            f ? f->nb_samples : 0);
      if (got > 0) {
        long n = std::min((long)got, max_samples - written);
        if (n > 0) {
          std::memcpy(out + written, chunk.data(), (size_t)n * sizeof(float));
          written += n;
        }
      }
    };
    while (av_read_frame(fmt, pkt) >= 0 && written < max_samples) {
      if (pkt->stream_index == stream &&
          avcodec_send_packet(dec, pkt) >= 0) {
        while (avcodec_receive_frame(dec, frame) >= 0) drain(frame);
      }
      av_packet_unref(pkt);
    }
    avcodec_send_packet(dec, nullptr);  // flush decoder
    while (avcodec_receive_frame(dec, frame) >= 0) drain(frame);
    drain(nullptr);  // flush resampler
    av_channel_layout_uninit(&in_layout);
  } while (false);

  if (frame) av_frame_free(&frame);
  if (pkt) av_packet_free(&pkt);
  if (swr) swr_free(&swr);
  if (dec) avcodec_free_context(&dec);
  avformat_close_input(&fmt);
  return written;
}

// ----------------------------------------------------------- ingest service

namespace {

struct Slot {
  std::vector<uint8_t> frames;
  std::vector<float> audio;
  long audio_len = 0;
  long tag = 0;
  int frames_decoded = 0;
};

struct Ingest {
  int workers, num_frames, size, sample_rate;
  long max_samples;
  bool want_video, want_audio;

  struct Job {
    std::string path;
    long tag;
    bool audio;  // per-item audio demux (skipped when a sidecar exists)
  };
  std::deque<Job> jobs;
  std::deque<Slot*> ready;
  std::vector<Slot*> free_slots;
  std::vector<std::thread> threads;
  std::mutex mu;
  std::condition_variable cv_job, cv_ready, cv_free;
  std::atomic<bool> stop{false};
  std::atomic<long> in_flight{0};

  Ingest(int workers_, int slots, int num_frames_, int size_, int sr,
         long max_samples_, bool video, bool audio)
      : workers(workers_), num_frames(num_frames_), size(size_),
        sample_rate(sr), max_samples(max_samples_), want_video(video),
        want_audio(audio) {
    for (int i = 0; i < slots; ++i) {
      Slot* s = new Slot();
      if (want_video)
        s->frames.resize((size_t)num_frames * size * size * 3);
      if (want_audio) s->audio.resize((size_t)max_samples);
      free_slots.push_back(s);
    }
    for (int i = 0; i < workers; ++i)
      threads.emplace_back([this] { run(); });
  }

  ~Ingest() {
    stop = true;
    cv_job.notify_all();
    cv_free.notify_all();
    for (auto& t : threads) t.join();
    std::unique_lock<std::mutex> lk(mu);
    for (Slot* s : free_slots) delete s;
    for (Slot* s : ready) delete s;
  }

  void run() {
    while (true) {
      Job job;
      Slot* slot = nullptr;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_job.wait(lk, [&] { return stop || (!jobs.empty() && !free_slots.empty()); });
        if (stop) return;
        job = jobs.front();
        jobs.pop_front();
        slot = free_slots.back();
        free_slots.pop_back();
      }
      slot->tag = job.tag;
      if (want_video)
        slot->frames_decoded =
            df_decode_clip(job.path.c_str(), num_frames, size, slot->frames.data());
      slot->audio_len = 0;
      if (want_audio && job.audio) {
        long n = df_decode_audio(job.path.c_str(), sample_rate,
                                 slot->audio.data(), max_samples);
        slot->audio_len = std::max(n, 0L);
        if (n >= 0 && n < max_samples)
          std::memset(slot->audio.data() + n, 0,
                      (size_t)(max_samples - n) * sizeof(float));
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        ready.push_back(slot);
      }
      cv_ready.notify_one();
    }
  }
};

}  // namespace

extern "C" void* df_ingest_create(int workers, int slots, int num_frames,
                                  int size, int sample_rate, long max_samples,
                                  int want_video, int want_audio) {
  return new Ingest(workers, slots, num_frames, size, sample_rate, max_samples,
                    want_video != 0, want_audio != 0);
}

extern "C" void df_ingest_destroy(void* h) { delete (Ingest*)h; }

extern "C" int df_ingest_submit_opts(void* h, const char* path, long tag,
                                     int want_audio) {
  // want_audio gates the audio demux PER ITEM (an offline sidecar makes the
  // native demux pure waste — the loader skips it for those clips); the
  // service-level want_audio still sizes the slot buffers.
  Ingest* ing = (Ingest*)h;
  {
    std::lock_guard<std::mutex> lk(ing->mu);
    ing->jobs.push_back(Ingest::Job{path, tag, want_audio != 0});
  }
  ing->in_flight.fetch_add(1);
  ing->cv_job.notify_one();
  return 0;
}

extern "C" int df_ingest_submit(void* h, const char* path, long tag) {
  return df_ingest_submit_opts(h, path, tag, 1);
}

extern "C" long df_ingest_next(void* h, uint8_t* frames_out, float* audio_out,
                               long* audio_len_out, int* frames_decoded_out) {
  // Blocks for the next completed item; copies into caller buffers and
  // recycles the slot. Returns the tag, or -1 if nothing is in flight.
  // frames_decoded_out receives df_decode_clip's result (<= 0 on failure —
  // the frame buffer then holds a PREVIOUS clip's recycled data and the
  // caller must fall back to host decode, not consume it).
  Ingest* ing = (Ingest*)h;
  if (ing->in_flight.load() == 0) return -1;
  Slot* slot = nullptr;
  {
    std::unique_lock<std::mutex> lk(ing->mu);
    ing->cv_ready.wait(lk, [&] { return !ing->ready.empty(); });
    slot = ing->ready.front();
    ing->ready.pop_front();
  }
  if (frames_decoded_out)
    *frames_decoded_out = ing->want_video ? slot->frames_decoded : 0;
  if (ing->want_video && frames_out)
    std::memcpy(frames_out, slot->frames.data(), slot->frames.size());
  if (ing->want_audio && audio_out) {
    // only the valid prefix is meaningful (callers slice audio[:len]);
    // audio-skipped items (len 0) copy nothing
    if (slot->audio_len > 0)
      std::memcpy(audio_out, slot->audio.data(),
                  (size_t)slot->audio_len * sizeof(float));
    if (audio_len_out) *audio_len_out = slot->audio_len;
  }
  long tag = slot->tag;
  {
    std::lock_guard<std::mutex> lk(ing->mu);
    ing->free_slots.push_back(slot);
  }
  ing->in_flight.fetch_sub(1);
  ing->cv_job.notify_one();
  return tag;
}

extern "C" long df_ingest_pending(void* h) {
  return ((Ingest*)h)->in_flight.load();
}

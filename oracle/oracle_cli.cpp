// Golden-bytes generator for differential tests.
//
// Drives the UPSTREAM reference library (compiled in place from /root/reference)
// to produce encoded streams / decoded clouds that the new TPU-native framework
// is tested against. This file is test tooling for THIS repo; it links the
// reference, it does not reimplement it.
//
// Usage:
//   oracle_cli encode <spec> <raw_points.bin> <out.cldn>
//   oracle_cli decode <in.cldn> <out_points.bin>
//   oracle_cli header <spec> <out_header.bin>
//   oracle_cli bound  <spec> <points_count> [include_header]
//   oracle_cli bench  <spec> <raw_points.bin> <iters>
//   oracle_cli dds-roundtrip <pc2.bin> <out_msg.bin> <out_pc2.bin> <res> [viz]
//
// <spec> is a small key=value / field list format (NOT the wire YAML):
//   width=123 height=1 point_step=16 encoding=LOSSY compression=NONE version=5
//   field=x:FLOAT32:0:0.001      (name:type:offset:resolution; resolution "-" = none)
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "cloudini_lib/cloudini.hpp"
#include "cloudini_lib/ros_msg_utils.hpp"

using namespace Cloudini;

static std::vector<uint8_t> readFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    throw std::runtime_error("cannot open " + path);
  }
  return std::vector<uint8_t>((std::istreambuf_iterator<char>(f)), std::istreambuf_iterator<char>());
}

static void writeFile(const std::string& path, const uint8_t* data, size_t size) {
  std::ofstream f(path, std::ios::binary);
  if (!f) {
    throw std::runtime_error("cannot open for write: " + path);
  }
  f.write(reinterpret_cast<const char*>(data), static_cast<std::streamsize>(size));
  f.flush();
  if (!f) {
    throw std::runtime_error("write failed: " + path);
  }
}

// Per-command operand count check: indexing argv past argc is UB (argv[argc]
// is NULL), so every command validates before touching its operands.
static void requireArgs(int argc, int needed, const char* usage) {
  if (argc < needed) {
    throw std::runtime_error(std::string("usage: oracle_cli ") + usage);
  }
}

static EncodingInfo parseSpec(const std::string& path) {
  std::ifstream f(path);
  if (!f) {
    throw std::runtime_error("cannot open spec " + path);
  }
  EncodingInfo info;
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') {
      continue;
    }
    const auto eq = line.find('=');
    if (eq == std::string::npos) {
      continue;
    }
    const std::string key = line.substr(0, eq);
    const std::string val = line.substr(eq + 1);
    if (key == "width") {
      info.width = static_cast<uint32_t>(std::stoul(val));
    } else if (key == "height") {
      info.height = static_cast<uint32_t>(std::stoul(val));
    } else if (key == "point_step") {
      info.point_step = static_cast<uint32_t>(std::stoul(val));
    } else if (key == "version") {
      info.version = static_cast<uint8_t>(std::stoul(val));
    } else if (key == "encoding") {
      info.encoding_opt = EncodingOptionsFromString(val);
    } else if (key == "compression") {
      info.compression_opt = CompressionOptionFromString(val);
    } else if (key == "encoding_config") {
      info.encoding_config = val;
    } else if (key == "field") {
      // name:type:offset:resolution
      std::stringstream ss(val);
      std::string name, type, offset, res;
      std::getline(ss, name, ':');
      std::getline(ss, type, ':');
      std::getline(ss, offset, ':');
      std::getline(ss, res, ':');
      PointField field;
      field.name = name;
      field.type = FieldTypeFromString(type);
      field.offset = static_cast<uint32_t>(std::stoul(offset));
      if (!res.empty() && res != "-") {
        field.resolution = std::stof(res);
      }
      info.fields.push_back(field);
    }
  }
  info.use_threads = false;  // deterministic single-thread path
  return info;
}

int main(int argc, char** argv) {
  try {
    if (argc < 3) {
      std::cerr << "usage: oracle_cli encode|decode|header|bound|bench|dds-roundtrip ..."
                << std::endl;
      return 2;
    }
    const std::string cmd = argv[1];
    if (cmd == "encode") {
      requireArgs(argc, 5, "encode <spec> <raw.bin> <out.cldn>");
      EncodingInfo info = parseSpec(argv[2]);
      auto raw = readFile(argv[3]);
      PointcloudEncoder encoder(info);
      std::vector<uint8_t> out;
      const size_t n = encoder.encode(ConstBufferView(raw.data(), raw.size()), out);
      writeFile(argv[4], out.data(), n);
      std::cout << n << std::endl;
    } else if (cmd == "decode") {
      requireArgs(argc, 4, "decode <stream.cldn> <out.bin>");
      auto data = readFile(argv[2]);
      ConstBufferView view(data.data(), data.size());
      EncodingInfo info = DecodeHeader(view);
      PointcloudDecoder decoder;
      std::vector<uint8_t> out;
      decoder.decode(info, view, out);
      writeFile(argv[3], out.data(), out.size());
      std::cout << out.size() << std::endl;
    } else if (cmd == "header") {
      requireArgs(argc, 4, "header <spec> <out.bin>");
      EncodingInfo info = parseSpec(argv[2]);
      std::vector<uint8_t> out;
      EncodeHeader(info, out);
      writeFile(argv[3], out.data(), out.size());
      std::cout << out.size() << std::endl;
    } else if (cmd == "bound") {
      // bound <spec> <points_count> [0|1 include_header] -> prints MaxCompressedSize
      requireArgs(argc, 4, "bound <spec> <points_count> [include_header]");
      EncodingInfo info = parseSpec(argv[2]);
      const size_t pts = static_cast<size_t>(std::stoull(argv[3]));
      const bool with_header = argc < 5 || std::stoi(argv[4]) != 0;
      std::cout << Cloudini::MaxCompressedSize(info, pts, with_header) << std::endl;
    } else if (cmd == "bench") {
      // bench <spec> <raw_points.bin> <iters> -> prints "enc_ns dec_ns bytes compressed_bytes"
      requireArgs(argc, 5, "bench <spec> <raw.bin> <iters>");
      EncodingInfo info = parseSpec(argv[2]);
      auto raw = readFile(argv[3]);
      const int iters = std::stoi(argv[4]);
      if (iters < 1) {
        throw std::runtime_error("bench: iters must be >= 1");
      }
      PointcloudEncoder encoder(info);
      std::vector<uint8_t> out;
      size_t n = 0;
      auto t0 = std::chrono::steady_clock::now();
      for (int i = 0; i < iters; ++i) {
        n = encoder.encode(ConstBufferView(raw.data(), raw.size()), out);
      }
      auto t1 = std::chrono::steady_clock::now();
      ConstBufferView view(out.data(), n);
      EncodingInfo dec_info = DecodeHeader(view);
      PointcloudDecoder decoder;
      std::vector<uint8_t> decoded;
      auto t2 = std::chrono::steady_clock::now();
      for (int i = 0; i < iters; ++i) {
        ConstBufferView payload(view.data(), view.size());
        decoder.decode(dec_info, payload, decoded);
      }
      auto t3 = std::chrono::steady_clock::now();
      const auto enc_ns = std::chrono::duration_cast<std::chrono::nanoseconds>(t1 - t0).count() / iters;
      const auto dec_ns = std::chrono::duration_cast<std::chrono::nanoseconds>(t3 - t2).count() / iters;
      std::cout << enc_ns << " " << dec_ns << " " << raw.size() << " " << n << std::endl;
    } else if (cmd == "dds-roundtrip") {
      // dds-roundtrip <pc2_dds.bin> <out_compressed_msg.bin> <out_pc2_dds.bin> <resolution> <viz:0|1>
      requireArgs(argc, 6, "dds-roundtrip <pc2.bin> <out_msg.bin> <out_pc2.bin> <resolution> [viz]");
      auto raw = readFile(argv[2]);
      auto pc = cloudini_ros::getDeserializedPointCloudMessage(
          Cloudini::ConstBufferView(raw.data(), raw.size()));
      const float res = std::stof(argv[5]);
      cloudini_ros::applyResolutionProfile({}, pc.fields, res);
      if (argc > 6 && std::string(argv[6]) == "1") {
        cloudini_ros::applyVizLossyPreprocessing(pc);
      }
      auto info = cloudini_ros::toEncodingInfo(pc);
      std::vector<uint8_t> compressed_msg;
      cloudini_ros::convertPointCloud2ToCompressedCloud(pc, info, compressed_msg);
      writeFile(argv[3], compressed_msg.data(), compressed_msg.size());

      auto cpc = cloudini_ros::getDeserializedPointCloudMessage(
          Cloudini::ConstBufferView(compressed_msg.data(), compressed_msg.size()));
      std::vector<uint8_t> pc2_msg;
      cloudini_ros::convertCompressedCloudToPointCloud2(cpc, pc2_msg);
      writeFile(argv[4], pc2_msg.data(), pc2_msg.size());
      std::cout << compressed_msg.size() << " " << pc2_msg.size() << std::endl;
    } else {
      std::cerr << "unknown command: " << cmd << std::endl;
      return 2;
    }
  } catch (const std::exception& ex) {
    std::cerr << "oracle_cli error: " << ex.what() << std::endl;
    return 1;
  }
  return 0;
}
